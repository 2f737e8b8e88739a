"""Unit tests for the curation ops: PII redaction, decontamination,
stratified sampling (plans/curation.py; oracle parity is the driver's job —
these pin the operator semantics on hand-built rows and the scale
properties the oracle can't see)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.functions.pii import (
    email_count,
    ipv4_count,
    phone_count,
    redact_pii,
)
from youtube_api_data_etl_automation_spark.operators.decontam import (
    ngram_contamination,
    word_ngrams,
)

from .conftest import SF_DIR


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(
        email_count("t").alias("e"),
        ipv4_count("t").alias("i"),
        phone_count("t").alias("p"),
        redact_pii("t").alias("r"),
    ).first()


def test_pii_detect_and_redact_all_kinds(spark):
    r = _one(
        spark,
        "mail a.b+c@site.co.uk now, ping 192.168.0.1 or 10.0.0.255, call 555-123-4567",
    )
    assert (r.e, r.i, r.p) == (1, 2, 1)
    assert r.r == "mail [EMAIL] now, ping [IP] or [IP], call [PHONE]"


def test_pii_clean_text_untouched(spark):
    r = _one(spark, "no contact info here, just words and 42 numbers")
    assert (r.e, r.i, r.p) == (0, 0, 0)
    assert r.r == "no contact info here, just words and 42 numbers"


def test_pii_adjacent_and_repeated(spark):
    r = _one(spark, "x@y.com a@b.org 1.2.3.4 555-000-0000 555-111-1111")
    assert (r.e, r.i, r.p) == (2, 1, 2)
    assert r.r == "[EMAIL] [EMAIL] [IP] [PHONE] [PHONE]"


def test_pii_partial_shapes_not_matched(spark):
    # Three-octet dotted number, short phone, bare @ — none are PII matches.
    r = _one(spark, "v1.2.3 at @handle tel 55-123-4567x")
    assert (r.e, r.i, r.p) == (0, 0, 0)


def test_word_ngrams_positions_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.g)
        for r in word_ngrams(df, "text", "doc_id", 3).collect()
    }
    assert got == {(1, "a b c"), (1, "b c d")}


def test_ngram_contamination_flags_overlap_only(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares "quick brown fox"
            (2, "entirely different words here"),
            (3, "eval quick brown fox tail"),  # shares it too
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox benchmark prompt")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: (r.n_hit_ngrams, r.contaminated)
        for r in ngram_contamination(corpus, bench, n=3).collect()
    }
    assert rows[1][1] and rows[3][1] and not rows[2][1]
    assert rows[1][0] >= 1 and rows[2][0] == 0
    # Every corpus doc gets a verdict row (clean docs included).
    assert set(rows) == {1, 2, 3}


def test_stratified_sample_partitioning_invariant(spark):
    from youtube_api_data_etl_automation_spark.plans.curation import (
        sampling_audits,
    )

    import os
    import tempfile

    a = {tuple(r) for r in sampling_audits(spark, SF_DIR).collect()}
    # Same query over a REWRITTEN, repartitioned copy of the table must
    # produce identical strata: the keep decision is content-hash-based,
    # not partition/file-layout-based. (The copy lives in its own sf-style
    # dir so the query actually reads it.)
    alt = tempfile.mkdtemp(prefix="strat_alt_sf_")
    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .repartition(13)
        .write.mode("overwrite")
        .parquet(os.path.join(alt, "documents.parquet"))
    )
    b = {tuple(r) for r in sampling_audits(spark, alt).collect()}
    assert a == b
    for section, _stratum, n_docs, n_sampled, *_ in a:
        if section == "stratified":
            assert 0 <= n_sampled <= n_docs


def test_stratified_rates_follow_targets(spark):
    from youtube_api_data_etl_automation_spark.plans.curation import (
        sampling_audits,
    )

    rows = {
        r.stratum: r
        for r in sampling_audits(spark, SF_DIR).collect()
        if r.section == "stratified"
    }
    assert rows["de"].n_sampled == rows["de"].n_docs  # rate 1.0 keeps all
    for lang, r in rows.items():
        # Achieved rate within a loose binomial band of the target (the
        # md5 bucket is uniform; n is small at sf0.001 so the band is wide).
        assert abs(r.achieved_rate - r.target_rate) < 0.25, (lang, r)


def test_pii_planted_entities_property(spark):
    """Property: plant K known PII strings into digit-free filler — counts
    must equal K per kind and redaction must remove every planted string."""
    import random

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "words", "filler", "plain"]
    rows = []
    for i in range(40):
        k_e, k_i, k_p = rng.randint(0, 3), rng.randint(0, 3), rng.randint(0, 3)
        pieces = [rng.choice(words) for _ in range(rng.randint(3, 10))]
        pieces += [f"u{j}x{i}@ex{j}.org" for j in range(k_e)]
        pieces += [f"10.{j}.{i % 200}.7" for j in range(k_i)]
        pieces += [f"555-00{j}-{1000 + i}" for j in range(k_p)]
        rng.shuffle(pieces)
        rows.append((i, k_e, k_i, k_p, " ".join(pieces)))
    df = spark.createDataFrame(
        rows, "i long, k_e int, k_i int, k_p int, t string"
    )
    got = df.select(
        "i", "k_e", "k_i", "k_p",
        email_count("t").alias("e"),
        ipv4_count("t").alias("ip"),
        phone_count("t").alias("p"),
        redact_pii("t").alias("r"),
    ).collect()
    for r in got:
        assert (r.e, r.ip, r.p) == (r.k_e, r.k_i, r.k_p), r
        assert "@" not in r.r
        for tok in r.r.split():
            assert not any(ch.isdigit() for ch in tok.replace("555", "")) or tok in (
                "[EMAIL]", "[IP]", "[PHONE]"
            ), r.r
