"""Error-bound + mergeability pins for functions/sketches.py.

Sketches can't hash-match a DuckDB oracle (approximate, implementation-
defined), so this is the documented weaker signal: estimates land within
the advertised error envelope of the exact answer, and sketch union over
partial groups equals one sketch over the whole — the property that makes
them the right 100 TB plan (partial agg + cheap rollup, no rescan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.functions.sketches import (
    approx_distinct,
    approx_quantiles,
    daily_distinct_rollup,
    hll_distinct_sketch,
    hll_estimate,
    hll_merge,
)
from youtube_api_data_etl_automation_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_hll_estimate_within_bound(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select("user_id").distinct().count()
    est = ev.agg(
        hll_estimate(hll_distinct_sketch("user_id")).alias("e")
    ).first().e
    assert abs(est - exact) <= max(3.0, 0.05 * exact), (est, exact)


def test_hll_union_of_slices_equals_whole(spark):
    ev = load_table(spark, SF_DIR, "events")
    whole = ev.agg(
        hll_estimate(hll_distinct_sketch("user_id")).alias("e")
    ).first().e
    # Sketch each event_type slice, then union the stored sketches — the
    # rollup-without-rescan pattern. HLL union is exact over sketch states,
    # so the merged estimate must equal the single-pass estimate.
    merged = (
        ev.groupBy("event_type")
        .agg(hll_distinct_sketch("user_id").alias("s"))
        .agg(hll_estimate(hll_merge("s")).alias("e"))
        .first()
        .e
    )
    assert merged == whole, (merged, whole)


def test_approx_distinct_rsd(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select("user_id").distinct().count()
    est = ev.agg(approx_distinct("user_id", rsd=0.02).alias("e")).first().e
    assert abs(est - exact) <= max(3.0, 0.06 * exact)  # ~3×rsd envelope


def test_approx_quantiles_bracket_exact(spark):
    o = load_table(spark, SF_DIR, "orders")
    approx = o.agg(
        approx_quantiles("o_totalprice", [0.25, 0.5, 0.75]).alias("q")
    ).first().q
    exact = o.selectExpr(
        "percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25",
        "percentile_cont(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS p50",
        "percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75",
    ).first()
    lo, hi = (
        o.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    )
    span = hi - lo
    for a, e in zip(approx, (exact.p25, exact.p50, exact.p75)):
        assert abs(a - e) <= 0.05 * span, (a, e)
    assert list(approx) == sorted(approx)  # monotone percentiles


def test_daily_rollup_total_matches_merge(spark):
    ev = load_table(spark, SF_DIR, "events")
    daily, total = daily_distinct_rollup(ev, F.to_date("ts"), "user_id")
    days = daily.collect()
    assert all(r.distinct_est >= 1 for r in days)
    exact = ev.select("user_id").distinct().count()
    t = total.first().distinct_total
    assert abs(t - exact) <= max(3.0, 0.05 * exact)
