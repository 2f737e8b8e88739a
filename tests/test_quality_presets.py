"""Gopher/C4 preset rules (operators/quality_presets.py) against
hand-built documents that each trip exactly one rule."""

from __future__ import annotations

import pytest

from youtube_api_data_etl_automation_spark.operators import (
    quality_presets as QP,
)

GOOD = ("The quick brown fox jumps over the lazy dog and runs on. "
        * 10)  # 100+ words, normal lengths, has the/and/to(?) stops


def _gopher(spark, rows):
    df = spark.createDataFrame(list(enumerate(rows)),
                               "doc_id long, text string")
    return {r["doc_id"]: r for r in QP.gopher_flags(df).collect()}


def test_gopher_rules_first_fail_attribution(spark):
    rows = [
        GOOD,                                           # 0 keep
        "short text with the and of that.",             # 1 word_count
        " ".join(["supercalifragilistic" * 2] * 60),    # 2 mean_word_len
        " ".join(["a#"] * 60),                          # 3 (len ok?) see below
        "\n".join(["• the bullet item of doom"] * 40),  # 4 bullet_lines
        "\n".join(["the line has many padding words and then"
                   " quietly trails right off…"] * 40),  # 5 ellipsis
        " ".join(["12345"] * 60),                       # 6 alpha or stops
        " ".join(["banana"] * 60),                      # 7 stop_words
        None,                                           # 8 NULL -> word_count
    ]
    out = _gopher(spark, rows)
    assert out[0]["gopher_verdict"] == "keep" and out[0]["gopher_pass"]
    assert out[1]["gopher_verdict"] == "word_count"
    assert out[2]["gopher_verdict"] == "mean_word_len"
    # row 3: 60 words of 'a#' (mean len 2 -> mean_word_len fires FIRST
    # per published rule order)
    assert out[3]["gopher_verdict"] == "mean_word_len"
    assert out[3]["g_symbol_ratio"] is False  # 60 '#' / 60 words = 1.0
    # rows 4/5: word count ok (40 * >=4 words), bullets/ellipsis 100%
    assert out[4]["gopher_verdict"] == "bullet_lines"
    assert out[5]["gopher_verdict"] == "ellipsis_lines"
    # row 6: '12345' x60 -> mean len 5 ok, no letters -> alpha_words
    assert out[6]["gopher_verdict"] == "alpha_words"
    # row 7: all-letter words, no required stop words
    assert out[7]["gopher_verdict"] == "stop_words"
    assert out[8]["gopher_verdict"] == "word_count"


def test_gopher_symbol_ratio_rule(spark):
    # long words so mean length passes; every word carries a '#'
    word = "the#word"
    doc = " ".join([word] * 30) + " " + " ".join(
        ["the of and that have with be to"] * 4)
    out = _gopher(spark, [doc])
    r = out[0]
    assert r["g_word_count"] and r["g_mean_word_len"]
    assert r["gopher_verdict"] == "symbol_ratio"
    # ellipsis also counts toward the symbol ratio
    doc2 = " ".join(["dots…"] * 30) + " " + " ".join(
        ["the of and that have with be to"] * 4)
    assert _gopher(spark, [doc2])[0]["gopher_verdict"] == "symbol_ratio"


def test_gopher_boundaries_exact(spark):
    # exactly 50 words with stops -> passes the word-count rule
    base = ["the", "of", "and", "that", "have", "with"]
    fifty = " ".join((base * 9)[:50])
    out = _gopher(spark, [fifty, " ".join((base * 9)[:49])])
    assert out[0]["g_word_count"] is True
    assert out[1]["g_word_count"] is False


def test_c4_line_rules(spark):
    text = "\n".join([
        "This is a proper sentence with enough words.",   # keep
        "Too short line.",                                  # <5 words
        "this line has enough words but no terminal mark",  # no punct
        "Enable javascript to view this page properly.",    # javascript
        "Please read our privacy policy before you proceed.",  # policy
        'He said "it ends with a quote perfectly fine."',   # keep
        "Another good sentence closes the page nicely!",    # keep
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = QP.c4_clean(df).collect()[0]
    kept = r["c4_text"].split("\n")
    assert kept == [
        "This is a proper sentence with enough words.",
        'He said "it ends with a quote perfectly fine."',
        "Another good sentence closes the page nicely!",
    ]
    assert r["c4_kept_lines"] == 3
    assert r["c4_pass"] and not r["c4_page_drop"]
    # original column untouched
    assert r["text"] == text


def test_c4_page_drops(spark):
    good_line = "This sentence is long enough and ends properly."
    rows = [
        (1, "\n".join([good_line] * 3)),                     # pass
        (2, "\n".join([good_line] * 2)),                     # <3 kept lines
        (3, "\n".join([good_line] * 3) + "\nLorem Ipsum dolor."),
        (4, "\n".join([good_line] * 3) + "\nvar x = { a: 1 }"),
        (5, None),                                           # NULL page
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in QP.c4_clean(df).collect()}
    assert out[1]["c4_pass"] is True
    assert out[2]["c4_pass"] is False
    assert out[3]["c4_pass"] is False   # lorem ipsum
    assert out[4]["c4_pass"] is False   # curly brace
    assert out[5]["c4_pass"] is False and out[5]["c4_kept_lines"] == 0


def test_presets_have_no_python_udfs(spark):
    """Both presets stay JVM-side: no BatchEvalPython / ArrowEvalPython
    in the plan (the interpreted higher-order funcs are fine — they're
    JVM expressions)."""
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    for fn in (QP.gopher_flags, QP.c4_clean):
        plan = fn(df)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "Exchange" not in plan  # map-only


def test_curate_corpus_preset_stages(spark):
    """quality_preset wires the presets ahead of the funnel with audit
    stage rows; text downstream is the c4-cleaned form."""
    from youtube_api_data_etl_automation_spark.corpus import curate_corpus

    keep_line = ("the data and the model have that quality with more "
                 "signal here.")
    good = "\n".join([keep_line] * 5)
    bullets = "\n".join([keep_line] * 3 + ["• bullet item"] * 50)
    lorem = good + "\nLorem ipsum dolor sit amet now."
    junk_line = "no terminal punctuation on this line at all"
    c4_killed = "\n".join([junk_line] * 6)
    rows = [(1, good), (2, bullets), (3, lorem), (4, c4_killed)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(
        docs, quality_preset="gopher+c4",
        min_tokens=1, max_tokens=100000, quality_min=0.0,
        n_shards=1)
    report = {r["stage"]: r["n_docs"]
              for r in out["report"].collect()}
    assert report["input"] == 4
    # c4: doc 3 (lorem) and doc 4 (no kept lines) drop
    assert report["c4"] == 2
    # gopher runs on the C4-CLEANED text: doc 2's bullets were already
    # line-filtered away, leaving 36 words — the word-count rule drops it
    assert report["gopher"] == 1
    survivors = out["documents"].collect()
    assert [r["doc_id"] for r in survivors] == [1]
    with pytest.raises(ValueError, match="quality_preset"):
        curate_corpus(docs, quality_preset="fineweb")


def _rep(spark, rows):
    df = spark.createDataFrame(list(enumerate(rows)),
                               "doc_id long, text string")
    return {r["doc_id"]: r for r in
            QP.gopher_repetition_flags(df).collect()}


def test_repetition_dup_lines_and_paragraphs(spark):
    # every token unique — no line, paragraph, or n-gram repeats
    varied = "\n".join(
        " ".join(f"tok{i}{c}" for c in "abcde") for i in range(10))
    # 10 lines, 6 of them the same -> 5/10 repeats = 0.5 > 0.3
    dupl = "\n".join(["the repeated line content here"] * 6
                     + [f"different line {i}" for i in range(4)])
    para = "\n\n".join(["one paragraph body"] * 4
                       + ["another", "third", "fourth", "fifth",
                          "sixth", "seventh"])
    out = _rep(spark, [varied, dupl, para])
    assert out[0]["gopher_rep_verdict"] == "keep"
    assert out[0]["dup_line_frac"] == 0.0
    r1 = out[1]
    assert r1["dup_line_frac"] == pytest.approx(0.5)
    assert r1["gopher_rep_verdict"] == "dup_line"
    r2 = out[2]
    # 10 paragraphs, 3 repeats -> 0.3 NOT > 0.3 -> passes para rule
    assert r2["dup_para_frac"] == pytest.approx(0.3)
    assert r2["rep_dup_para"] == True  # noqa: E712 boundary inclusive


def test_repetition_char_fractions(spark):
    # one LONG line duplicated once among many short lines: the
    # count fraction is small but the CHAR fraction is large
    long_line = "x" * 400
    text = "\n".join([long_line, long_line]
                     + [f"s {i}" for i in range(18)])
    r = _rep(spark, [text])[0]
    assert r["dup_line_frac"] == pytest.approx(1 / 20)
    assert r["dup_line_char_frac"] > 0.2
    assert r["gopher_rep_verdict"] == "dup_line_chars"


def test_repetition_top_ngram_fraction(spark):
    # 'alpha beta' repeated heavily among filler: top 2-gram chars
    # dominate
    filler = " ".join(f"w{i:03d}" for i in range(40))
    text = "alpha beta " * 30 + filler
    r = _rep(spark, [text])[0]
    assert r["gopher_rep_verdict"] == "top_2gram"
    assert r["rep_top_2gram"] == False  # noqa: E712
    # hand check: tokens = 60 + 40; top 2-gram ('alpha beta') occurs
    # 30 times, 9 chars; token chars = 60*~4.5 + 40*4
    tok_chars = 30 * (5 + 4) + 40 * 4
    assert abs((30 * 9) / tok_chars) > 0.2


def test_repetition_dup_ngram_fraction(spark):
    # a 7-gram repeated twice inside otherwise-unique text: fires the
    # dup_{5..10}gram family but not the top-{2,3,4} family
    phrase = "one two three four five six seven"
    uniq = " ".join(f"tok{i:04d}" for i in range(40))
    text = f"{phrase} {uniq} {phrase}"
    r = _rep(spark, [text])[0]
    assert r["gopher_rep_verdict"].startswith("dup_")
    assert "gram" in r["gopher_rep_verdict"]


def test_repetition_empty_and_null_pass(spark):
    out = _rep(spark, ["", None, "just a few plain words here"])
    for i in range(3):
        assert out[i]["gopher_rep_pass"], i


def test_curate_corpus_gopher_rep_stage(spark):
    from youtube_api_data_etl_automation_spark.corpus import curate_corpus

    base_line = ("the data and the model have that quality with more "
                 "signal here.")
    uniq = " ".join(f"tok{i:03d}" for i in range(60)) \
        + " the of and that."
    repeated = "\n".join([base_line] * 20)  # dup lines >> 0.3
    docs = spark.createDataFrame(
        [(1, uniq), (2, repeated)], "doc_id long, text string")
    out = curate_corpus(
        docs, quality_preset="gopher-rep",
        min_tokens=1, max_tokens=100000, quality_min=0.0, n_shards=1)
    report = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert report["input"] == 2 and report["gopher_rep"] == 1
    assert [r["doc_id"] for r in out["documents"].collect()] == [1]


def test_repetition_random_differential(spark):
    """Seeded random documents vs an independent Python computation of
    every published fraction — one Spark pass over 60 docs."""
    import random
    from collections import Counter

    rng = random.Random(4242)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(60):
        n_lines = rng.randint(1, 12)
        lines = []
        for _ in range(n_lines):
            k = rng.randint(1, 10)
            lines.append(" ".join(rng.choice(vocab) for _ in range(k)))
        # sometimes force duplicate lines / heavy gram repetition
        if rng.random() < 0.4 and lines:
            lines += [rng.choice(lines)] * rng.randint(1, 4)
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           QP.gopher_repetition_flags(df).collect()}

    for i, text in docs:
        norm = " ".join(text.lower().split())
        toks = norm.split(" ") if norm else []
        tok_chars = sum(len(t) for t in toks)
        lines = [ln for ln in text.split("\n") if ln.strip()]

        def dup_stats(elems):
            c = Counter(elems)
            total, chars = len(elems), sum(len(e) for e in elems)
            dn = sum(k - 1 for k in c.values() if k > 1)
            dc = sum((k - 1) * len(e) for e, k in c.items() if k > 1)
            return (dn / total if total else 0.0,
                    dc / chars if chars else 0.0)

        lf, lcf = dup_stats(lines)
        r = got[i]
        assert r["dup_line_frac"] == pytest.approx(lf, abs=1e-12), i
        assert r["dup_line_char_frac"] == pytest.approx(lcf,
                                                        abs=1e-12), i
        for n, col, kind in [(2, "rep_top_2gram", "top"),
                             (3, "rep_top_3gram", "top"),
                             (4, "rep_top_4gram", "top"),
                             (5, "rep_dup_5gram", "dup"),
                             (7, "rep_dup_7gram", "dup"),
                             (10, "rep_dup_10gram", "dup")]:
            grams = [tuple(toks[j:j + n])
                     for j in range(len(toks) - n + 1)]
            c = Counter(grams)
            if kind == "top":
                # most frequent gram, ties toward larger coverage,
                # grams occurring once excluded
                cands = [(k, sum(len(w) for w in g))
                         for g, k in c.items() if k > 1]
                v = (lambda kk, ch: kk * ch)(*max(cands)) if cands \
                    else 0
                thr = QP.GOPHER_MAX_TOP_NGRAM_CHAR_FRAC[n]
            else:
                v = sum(k * sum(len(w) for w in g)
                        for g, k in c.items() if k > 1)
                thr = QP.GOPHER_MAX_DUP_NGRAM_CHAR_FRAC[n]
            frac = v / tok_chars if tok_chars else 0.0
            assert r[col] == (frac <= thr), (i, col, frac)


def test_repetition_plan_no_nested_loop(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = QP.gopher_repetition_flags(df)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_top_ngram_is_most_frequent_not_max_product(spark):
    """r12 review fix: the top-gram rule reads the MOST FREQUENT
    gram's coverage — a rarer-but-longer gram with a larger
    count*chars product must not be selected."""
    # 'a b' x10 (4 chars coverage each, total 40 over its own count)
    # vs 'wwwwwwwwww xxxxxxxxxx' x2 (product 40 but count only 2)
    filler = " ".join(f"u{i:03d}" for i in range(120))
    text = ("a b " * 10
            + "wwwwwwwwww xxxxxxxxxx yy wwwwwwwwww xxxxxxxxxx "
            + filler)
    r = _rep(spark, [text])[0]
    norm = " ".join(text.lower().split())
    toks = norm.split(" ")
    tok_chars = sum(len(t) for t in toks)
    # most frequent 2-gram is ('a','b'): count>=10, chars 2
    from collections import Counter
    c = Counter(tuple(toks[j:j + 2]) for j in range(len(toks) - 1))
    (top_gram, top_cnt) = max(c.items(), key=lambda kv: (kv[1],
                              sum(len(w) for w in kv[0])))
    want = top_cnt * sum(len(w) for w in top_gram) / tok_chars
    assert r["rep_top_2gram"] == (
        want <= QP.GOPHER_MAX_TOP_NGRAM_CHAR_FRAC[2])


def test_repetition_dolma_style_parameters(spark):
    """r13 ADVICE: the gating/denominator knobs reproduce the
    Dolma/datatrove reading — once-occurring top grams count
    (min_count=1) and fractions divide by length(text) — verified
    against an independent Python computation."""
    from collections import Counter

    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),   # all grams once
        (1, "aa bb aa bb aa bb cc dd"),
        (2, "x " * 30),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in QP.gopher_repetition_flags(
        df, top_ngram_min_count=1,
        char_denominator="text_chars").collect()}

    for i, text in docs:
        toks = " ".join(text.lower().split()).split(" ")
        denom = len(text)
        for n in (2, 3, 4):
            grams = [tuple(toks[j:j + n])
                     for j in range(len(toks) - n + 1)]
            c = Counter(grams)
            cands = [(k, sum(len(w) for w in g)) for g, k in c.items()]
            v = (lambda kk, ch: kk * ch)(*max(cands)) if cands else 0
            frac = v / denom if denom else 0.0
            thr = QP.GOPHER_MAX_TOP_NGRAM_CHAR_FRAC[n]
            assert got[i][f"rep_top_{n}gram"] == (frac <= thr), (i, n)

    with pytest.raises(ValueError, match="char_denominator"):
        QP.gopher_repetition_flags(df, char_denominator="bytes")
    with pytest.raises(ValueError, match="min_count"):
        QP.gopher_repetition_flags(df, top_ngram_min_count=0)
