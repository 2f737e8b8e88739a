"""Mergeable sketch aggregates — the 100 TB variants of exact distinct /
percentile / frequency aggregation.

The registry's oracle-checked queries use exact forms (COUNT DISTINCT,
percentile_cont) because approximate answers can't hash-match a DuckDB
oracle. At cluster scale the exact forms are the wrong plan — exact
distinct expands every row, exact percentiles hold full per-group value
lists — so these wrappers expose Spark's sketch aggregates with the
properties that matter for a 1000-executor run:

- **mergeable**: sketch partial states combine associatively, so partial
  aggregation (map-side combine) applies and re-aggregation across days /
  partitions / tables is a cheap union of fixed-size states, never a
  rescan (``hll_union_agg`` over stored sketch columns);
- **bounded size**: state is O(k), independent of group cardinality.

Error-bound and mergeability properties are pinned by
``tests/test_sketches.py`` (not oracle-checked — documented as the weaker
signal; the exact twins are the driver-verified ones: `date_spine_gapfill`
for distinct counts, `percentile_prices` for percentiles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct_sketch(col: Column | str, lgk: int = 12) -> Column:
    """HLL sketch aggregate (Apache DataSketches) — store this, not counts:
    stored sketches re-aggregate by union without rescanning the fact."""
    return F.hll_sketch_agg(col, F.lit(lgk))


def hll_estimate(sketch: Column | str) -> Column:
    return F.hll_sketch_estimate(sketch)


def hll_merge(sketch: Column | str) -> Column:
    """Union previously-stored HLL sketches (rollup across groups/days)."""
    return F.hll_union_agg(sketch)


def approx_distinct(col: Column | str, rsd: float = 0.02) -> Column:
    """HyperLogLog++ count (scalar convenience; rsd = relative std dev)."""
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(col: Column | str, probs: list[float], acc: int = 10000) -> Column:
    """Fixed-memory percentile summary (Greenwald-Khanna style)."""
    return F.percentile_approx(col, F.array(*[F.lit(p) for p in probs]), F.lit(acc))


def daily_distinct_rollup(
    df: DataFrame, day_col: Column | str, key_col: Column | str
) -> tuple[DataFrame, DataFrame]:
    """Two-level distinct rollup: per-day HLL sketches, then a total via
    sketch union — the scale pattern for `date_spine_gapfill`'s n_users
    column. Returns ``(per_day, total)`` (the annotation lied about a
    single DataFrame before r6). The sketch relation is localCheckpoint'd
    so BOTH outputs derive from one materialized per-day aggregation —
    without it each output re-scanned the fact table, which is exactly
    the rescan this pattern exists to avoid."""
    day = F.col(day_col) if isinstance(day_col, str) else day_col
    daily = df.groupBy(day.alias("day")).agg(
        hll_distinct_sketch(key_col).alias("users_sketch")
    ).localCheckpoint()
    total = daily.agg(
        hll_estimate(hll_merge("users_sketch")).alias("distinct_total")
    )
    return daily.select(
        "day", hll_estimate("users_sketch").alias("distinct_est")
    ), total
