"""Temperature mixing: rate math vs closed form, expected-size targeting,
determinism under repartitioning, and upweighting direction."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.operators.mixing import (
    apply_mixture,
    mixture_rates,
)
from youtube_api_data_etl_automation_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_rates_match_closed_form(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rates = {r.lang: (r.n_rows, r.rate) for r in
             mixture_rates(docs, "lang", alpha=0.5, target_rows=300).collect()}
    tw = sum(n ** 0.5 for n, _ in rates.values())
    for lang, (n, rate) in rates.items():
        assert abs(rate - 300 * (n ** 0.5) / tw / n) < 1e-12
    # Expected output sums to the target.
    assert abs(sum(n * r for n, r in rates.values()) - 300) < 1e-9


def test_alpha_upweights_small_sources(spark):
    docs = load_table(spark, SF_DIR, "documents")
    r_nat = {r.lang: r.rate for r in mixture_rates(docs, "lang", 1.0, 300).collect()}
    r_T = {r.lang: r.rate for r in mixture_rates(docs, "lang", 0.3, 300).collect()}
    ns = {r.lang: r.n_rows for r in mixture_rates(docs, "lang", 1.0, 300).collect()}
    small = min(ns, key=ns.get)
    big = max(ns, key=ns.get)
    # alpha=1 is a uniform rate across sources; lower alpha boosts the
    # small source's rate relative to the big one's.
    assert abs(r_nat[small] - r_nat[big]) < 1e-12
    assert r_T[small] > r_nat[small] and r_T[big] < r_nat[big]


def test_apply_is_deterministic_and_near_target(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rates = mixture_rates(docs, "lang", alpha=0.5, target_rows=300)
    out1 = apply_mixture(docs, rates, source_col="lang", id_col="doc_id")
    out2 = apply_mixture(
        docs.repartition(13), rates, source_col="lang", id_col="doc_id"
    )
    a = sorted((r.doc_id, r.copy_idx) for r in out1.select("doc_id", "copy_idx").collect())
    b = sorted((r.doc_id, r.copy_idx) for r in out2.select("doc_id", "copy_idx").collect())
    assert a == b
    # Binomial tolerance around the expected size.
    assert abs(len(a) - 300) < 60, len(a)
    # copy_idx enumerates repeats from 1.
    assert min(c for _, c in a) == 1


def test_rate_above_one_repeats_rows(spark):
    df = spark.createDataFrame(
        [(i, "tiny") for i in range(5)] + [(100 + i, "huge") for i in range(500)],
        "doc_id long, source string",
    )
    rates = mixture_rates(df, "source", alpha=0.0, target_rows=500)
    # alpha=0: equal mass per source -> tiny source rate = 250/5 = 50x.
    out = apply_mixture(df, rates, source_col="source", id_col="doc_id")
    tiny_copies = out.filter(F.col("source") == "tiny").count()
    assert 200 <= tiny_copies <= 300, tiny_copies  # ~250 expected
    per_doc = (
        out.filter(F.col("source") == "tiny").groupBy("doc_id").count().collect()
    )
    assert all(r["count"] >= 49 for r in per_doc)


def test_null_source_and_null_id_not_dropped(spark):
    rows = (
        [(i, "big") for i in range(100)]
        + [(200 + i, None) for i in range(10)]
        + [(None, "big")]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = mixture_rates(df, "source", alpha=1.0, target_rows=111)
    # NULL sources are a stratum, not silently vanished mass.
    by_src = {r.source: r.n_rows for r in rates.collect()}
    assert by_src["__null_source__"] == 10 and by_src["big"] == 101
    out = apply_mixture(df, rates, source_col="source", id_col="doc_id")
    # alpha=1, target=input size -> rate 1.0 everywhere -> exact passthrough,
    # including the NULL-source rows and the NULL-id row.
    assert out.count() == 111


def test_sqrt_rates_match_pow_rates(spark):
    """mixture_rates_sqrt is the alpha=0.5 special case of mixture_rates
    with integer-quantized weights; rates agree to the quantization budget
    (weight_scale=1e6 -> relative error < ~1e-6 per source)."""
    from youtube_api_data_etl_automation_spark.operators.mixing import (
        mixture_rates_sqrt,
    )

    rows = [(i, f"s{i % 7}") for i in range(300)] + [(1000 + i, "rare") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    pow_rates = {
        r.source: r.rate
        for r in mixture_rates(df, "source", alpha=0.5, target_rows=200).collect()
    }
    sqrt_rates = {
        r.source: r.rate for r in mixture_rates_sqrt(df, "source", 200).collect()
    }
    assert set(pow_rates) == set(sqrt_rates)
    for s, r in pow_rates.items():
        assert abs(sqrt_rates[s] - r) / r < 1e-5, (s, sqrt_rates[s], r)
