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


def test_percentile_prices_approx_rank_error(spark):
    """The scale twin of percentile_prices honors the GK guarantee at the
    driver's gate scale: for every group and quantile q, the returned
    value's fractional rank within its group is within 1/accuracy of q
    (plus discreteness slack), and each value is bracketed by the group's
    min/max. Also: identical schema to the exact query."""
    from collections import defaultdict

    from youtube_api_data_etl_automation_spark.plans.advanced import (
        percentile_prices,
        percentile_prices_approx,
    )

    sf = "/root/testdata/sf0.01"
    acc = 10_000
    approx_df = percentile_prices_approx(spark, sf, accuracy=acc)
    exact_df = percentile_prices(spark, sf)
    assert approx_df.schema == exact_df.schema

    groups: dict[str, list[float]] = defaultdict(list)
    for r in load_table(spark, sf, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect():
        groups[r.o_orderpriority].append(r.o_totalprice)

    rows = {r.o_orderpriority: r for r in approx_df.collect()}
    assert set(rows) == set(groups)
    for prio, vals in groups.items():
        vals.sort()
        n = len(vals)
        for q, col in ((0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.99, "p99")):
            a = getattr(rows[prio], col)
            assert vals[0] <= a <= vals[-1]
            # fractional rank of the returned value inside the group
            import bisect

            lo = bisect.bisect_left(vals, a - 1e-6) / n
            hi = bisect.bisect_right(vals, a + 1e-6) / n
            slack = 1.0 / acc + 1.0 / n
            assert lo - slack <= q <= hi + slack, (prio, col, a, lo, hi)
