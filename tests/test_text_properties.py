"""Hypothesis differential tests for the text primitives (SURVEY.md §5
item 4): the engine's Column expressions vs transparent pure-Python
re-statements, over generated unicode text."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from youtube_api_data_etl_automation_spark.functions.text import (
    doc_fingerprint,
    token_count,
    tokens,
    word_shingles,
)


def py_normalize(s: str) -> str:
    # ASCII whitespace ONLY: Java regex \s (the engine) and RE2 \s (the
    # DuckDB oracle) both exclude unicode spaces like NBSP — so must the
    # reference. (Hypothesis found this: '\xa0' is a token char, not a
    # separator, in the engine's semantics.)
    return re.sub(r"[ \t\n\r\f\v]+", " ", s).strip(" ").lower()


def py_tokens(s: str | None) -> list[str]:
    if s is None:
        return []
    n = py_normalize(s)
    return [] if n == "" else n.split(" ")


def py_shingles(s: str | None, k: int = 3) -> list[str]:
    t = py_tokens(s)
    if len(t) < k:
        return []
    return [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]


# Heavy whitespace/punct mixing plus NBSP — the normalization traps.
# Alphabet avoids exotic case-mapping codepoints (İ, ß …) whose lower()
# differs between Python and the JVM; that divergence is out of scope here
# (the engine↔oracle pair agrees — both use simple mappings).
texts = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Nd", "Po"),
            whitelist_characters="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZéñøα\t\n\r \xa0",
        ),
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None)
@given(texts)
def test_tokens_and_shingles_match_python(spark, batch):
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(batch)), "text": batch}), "i long, text string"
    )
    got = {
        r["i"]: (list(r["tok"]), list(r["sh"]), int(r["n"]))
        for r in df.select(
            "i",
            tokens("text").alias("tok"),
            word_shingles("text", 3).alias("sh"),
            token_count("text").alias("n"),
        ).collect()
    }
    for i, s in enumerate(batch):
        exp_t = py_tokens(s)
        assert got[i][0] == exp_t, (s, got[i][0], exp_t)
        assert got[i][1] == py_shingles(s), s
        assert got[i][2] == len(exp_t), s


@settings(max_examples=10, deadline=None)
@given(texts)
def test_clf_logit_matches_python(spark, batch):
    """Hashed-feature classifier logit vs a transparent Python fold (same
    md5-bucket weights, same left-to-right double summation order)."""
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F

    from youtube_api_data_etl_automation_spark.functions.text import (
        clf_logit_t,
        clf_score_t,
        tokens,
    )

    def py_logit(s: str) -> float:
        acc = 0.0
        toks = py_tokens(s)
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:2], 16)
            acc = acc + ((b % 17) / 17.0 - 0.5)  # same grouping as engine+oracle
        return acc / (1.0 + len(toks))

    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(batch)), "text": batch}), "i long, text string"
    ).select("i", tokens("text").alias("tok"))
    got = {
        r["i"]: (r["z"], r["p"])
        for r in df.select(
            "i", clf_logit_t("tok").alias("z"), clf_score_t("tok").alias("p")
        ).collect()
    }
    for i, s in enumerate(batch):
        assert got[i][0] == py_logit(s), (s, got[i][0], py_logit(s))
        assert 0.0 < got[i][1] < 1.0  # sigmoid stays in the open interval


def test_clf_score_monotone_in_logit(spark):
    """Thresholding the logit is thresholding the probability: score order
    must equal logit order (the justification for oracle-checking the
    rational logit instead of the transcendental sigmoid)."""
    import pandas as pd

    from youtube_api_data_etl_automation_spark.functions.text import (
        clf_logit_t,
        clf_score_t,
        tokens,
    )

    docs = [f"w{i} x{i * 7} y z common tail words" for i in range(40)]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(docs)), "text": docs}), "i long, text string"
    ).select("i", tokens("text").alias("tok"))
    rows = df.select(clf_logit_t("tok").alias("z"), clf_score_t("tok").alias("p")).collect()
    by_z = sorted(rows, key=lambda r: r.z)
    assert [r.p for r in by_z] == sorted(r.p for r in rows)


@settings(max_examples=10, deadline=None)
@given(st.text(alphabet="abc defg.h,i!42\t\n", max_size=60))
def test_fingerprint_is_normalization_invariant(spark, s):
    """Same normalized content ⇒ same fingerprint: leading/trailing/repeated
    whitespace and case differences must not change it."""
    import hashlib

    import pandas as pd

    variants = [s, "  " + s + "\t", s.upper(), re.sub(r" ", "   ", s)]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(variants)), "text": variants}),
        "i long, text string",
    )
    fps = [r["fp"] for r in df.select(doc_fingerprint("text").alias("fp"), "i")
           .orderBy("i").collect()]
    assert len(set(fps)) == 1, (s, fps)
    expected = hashlib.md5(py_normalize(s).encode()).hexdigest()
    assert fps[0] == expected
