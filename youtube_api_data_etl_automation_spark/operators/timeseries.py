"""Time-range window aggregates: physical-time frames, not row counts.

The reference's implied analytics are calendar-based ("daily stats",
`.github/workflows/daily_etl.yml:5-7`); the general op is an aggregate
over a trailing physical-time window per row — ROWS frames can't express
it when event spacing is irregular (a 7-day trailing average is a
different row count for every row).

Spark shape: ``Window.orderBy(unix-time).rangeBetween(-seconds, 0)`` per
key. One shuffle on the partition key; within a partition the frame is a
sliding pointer over the sorted run (O(n) amortized, no per-row rescan).
The microsecond ordering key avoids the whole-second truncation trap the
r1 as-of advice flagged (plans/relational.py::window_running_lag, the
fused as-of column)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def trailing_window(
    df: DataFrame,
    *,
    partition_col: str,
    ts_col: str,
    value_col: str,
    trailing_days: int,
    aggs: tuple[str, ...] = ("sum", "count", "avg"),
) -> DataFrame:
    """Append trailing-``trailing_days`` aggregates of ``value_col`` per
    ``partition_col``, inclusive of the current row's instant.

    Sums accumulate in decimal so the result is order-independent (the
    window frame's internal add order is not guaranteed)."""
    unknown = set(aggs) - {"sum", "count", "avg"}
    if unknown:
        raise ValueError(f"unknown aggs {sorted(unknown)}; expected sum/count/avg")
    span_us = trailing_days * 86_400 * 1_000_000
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-span_us, 0)
    )
    dec = F.col(value_col).cast("decimal(18,6)")
    cols: dict[str, Column] = {}
    if "sum" in aggs:
        cols[f"sum_{trailing_days}d"] = F.sum(dec).over(w).cast("double")
    if "count" in aggs:
        cols[f"n_{trailing_days}d"] = F.count(F.lit(1)).over(w).cast("long")
    if "avg" in aggs:
        # SQL AVG semantics: NULL values are excluded from BOTH sides —
        # dividing the NULL-skipping sum by COUNT(*) would treat NULLs as
        # zeros. count(dec) counts only non-NULL values.
        cols[f"avg_{trailing_days}d"] = (
            F.sum(dec).over(w) / F.count(dec).over(w)
        ).cast("double")
    out = df
    for name, col in cols.items():
        out = out.withColumn(name, col)
    return out
