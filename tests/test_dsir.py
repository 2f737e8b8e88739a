"""DSIR importance resampling (operators/dsir.py): λ vs a hashlib
reference, map-side scoring value + plan pins, Gumbel draw stability, and
end-to-end distribution shift."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.operators.dsir import (
    bucket_logratios,
    collect_logratios,
    dsir_log_weights,
    dsir_select,
    gumbel_select,
)

B = 256


def _bucket(term: str, salt: str = "dsir:") -> int:
    return int(hashlib.md5((salt + term).encode()).hexdigest()[:2], 16)


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _py_lambdas(target_texts, raw_texts):
    def counts(texts):
        c: dict[int, int] = {}
        for t in texts:
            for w in t.lower().split():
                b = _bucket(w)
                c[b] = c.get(b, 0) + 1
        return c

    ct, cr = counts(target_texts), counts(raw_texts)
    nt, nr = sum(ct.values()), sum(cr.values())
    return [
        _r6(math.log(((ct.get(b, 0) + 1.0) * (nr + 256.0))
                     / ((cr.get(b, 0) + 1.0) * (nt + 256.0))))
        for b in range(B)
    ]


TARGET = ["alpha beta gamma", "alpha beta delta", "beta gamma epsilon"]
RAW = [
    (0, "alpha beta gamma delta"),
    (1, "zeta eta theta iota"),
    (2, "alpha alpha beta beta"),
    (3, "kappa lambda mu nu"),
    (4, ""),
]


@pytest.fixture(scope="module")
def dfs(spark):
    tgt = spark.createDataFrame([(t,) for t in TARGET], "text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    return tgt, raw


def test_bucket_logratios_match_python_reference(spark, dfs):
    tgt, raw = dfs
    got = collect_logratios(bucket_logratios(tgt, raw))
    want = _py_lambdas(TARGET, [t for _, t in RAW])
    assert got == pytest.approx(want, abs=1e-12)
    assert len(got) == B  # full domain incl. smoothed empty buckets


def test_log_weights_are_decimal_exact_lambda_sums(spark, dfs):
    tgt, raw = dfs
    lams = collect_logratios(bucket_logratios(tgt, raw))
    got = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(raw, lams).collect()
    }
    for doc_id, text in RAW:
        want = round(sum(lams[_bucket(w)] for w in text.lower().split()), 6)
        assert got[doc_id] == pytest.approx(want, abs=1e-9), doc_id
    assert got[4] == 0.0  # empty text scores zero, not NULL


def test_scoring_plan_is_map_only(spark, dfs):
    tgt, raw = dfs
    lams = collect_logratios(bucket_logratios(tgt, raw))
    plan = (
        dsir_log_weights(raw, lams)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan


def test_gumbel_select_is_content_stable_without_replacement(spark, dfs):
    tgt, raw = dfs
    lams = collect_logratios(bucket_logratios(tgt, raw))
    w = dsir_log_weights(raw, lams)
    a = gumbel_select(w, 3).select("doc_id", "rank").collect()
    b = gumbel_select(w.repartition(5), 3).select("doc_id", "rank").collect()
    assert sorted((r["doc_id"], r["rank"]) for r in a) == sorted(
        (r["doc_id"], r["rank"]) for r in b
    )
    ids = [r["doc_id"] for r in a]
    assert len(set(ids)) == 3  # without replacement
    assert sorted(r["rank"] for r in a) == [1, 2, 3]


def test_dsir_select_prefers_target_like_docs(spark):
    # Target speaks vocab A; the raw pool has 10 in-distribution and 10
    # off-distribution docs. Importance weights must rank EVERY vocab-A
    # doc above every vocab-B doc (clear margins; the draw then samples
    # ∝ exp(log_w), so top picks are overwhelmingly in-distribution).
    tgt = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)] * 3, "text string"
    )
    rows = [(i, "alpha beta gamma delta epsilon") for i in range(10)]
    rows += [(100 + i, "zulu yankee xray whiskey victor") for i in range(10)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir_select(tgt, raw, 5).collect()
    lw = {r["doc_id"]: r["log_w"] for r in out}
    sel = dsir_log_weights(
        raw, collect_logratios(bucket_logratios(tgt, raw))
    ).collect()
    in_w = [r["log_w"] for r in sel if r["doc_id"] < 100]
    out_w = [r["log_w"] for r in sel if r["doc_id"] >= 100]
    assert min(in_w) > max(out_w)
    for r in out:
        assert r["log_w"] == pytest.approx(lw[r["doc_id"]])
