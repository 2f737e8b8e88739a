"""trailing_window vs a DuckDB RANGE-frame oracle on real events — the
pytest-level differential for a non-registry op (registry is pinned at the
driver's 50-query window)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.operators.timeseries import (
    trailing_window,
)
from youtube_api_data_etl_automation_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_trailing_7d_matches_duckdb(spark):
    ev = load_table(spark, SF_DIR, "events")
    got = {
        (r.event_id): (r.n_7d, round(r.sum_7d, 6), r.avg_7d)
        for r in trailing_window(
            ev,
            partition_col="user_id",
            ts_col="ts",
            value_col="value",
            trailing_days=7,
        )
        .select("event_id", "n_7d", "sum_7d", "avg_7d")
        .collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_id,
               COUNT(*) OVER w AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s,
               CAST(AVG(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS a
        FROM read_parquet('{SF_DIR}/events.parquet')
        WINDOW w AS (
          PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
        )
        """
    ).fetchall()
    assert len(rows) == len(got)
    for eid, n, s, avg in rows:
        gn, gs, ga = got[eid]
        assert gn == n, (eid, gn, n)
        assert abs(gs - s) < 1e-9, (eid, gs, s)
        assert abs(ga - avg) < 1e-9, (eid, ga, avg)


def test_avg_excludes_nulls(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10.0), (1, "2024-01-02 00:00:00", None)],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    rows = {
        r.value: r.avg_7d
        for r in trailing_window(
            df, partition_col="user_id", ts_col="ts", value_col="value",
            trailing_days=7,
        ).collect()
    }
    # The NULL-value row's window holds [10.0, NULL]: SQL AVG = 10.0, not 5.0.
    assert rows[None] == 10.0
    with pytest.raises(ValueError):
        trailing_window(
            df, partition_col="user_id", ts_col="ts", value_col="value",
            trailing_days=7, aggs=("mean",),
        )


def test_single_shuffle_plan(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = trailing_window(
        ev, partition_col="user_id", ts_col="ts", value_col="value",
        trailing_days=7,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # All three window columns share one (partition, order) spec: exactly
    # one hash exchange, one Window node chain - no repeated shuffles.
    assert plan.count("Exchange hashpartitioning") == 1


def test_native_session_window_matches_custom_sessionizer(spark):
    """Spark's built-in session_window aggregation must produce the same
    sessions as the custom window-based sessionizer (operators/sessionize)
    — same count, same per-session (start, n, sum). The built-in is the
    preferred streaming form (works under watermarks with merging state);
    the custom op exists because it also yields per-event session ids,
    which session_window's aggregate-only shape cannot."""
    from youtube_api_data_etl_automation_spark.operators.sessionize import (
        session_stats,
    )
    from youtube_api_data_etl_automation_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    custom = {
        (r.user_id, r.session_start_us): (r.n_events, round(r.sum_value, 6))
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    native = {
        (r.user_id, r.start_us): (r.n, round(r.s, 6))
        for r in ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .select(
            "user_id", F.unix_micros("w.start").alias("start_us"), "n", "s"
        )
        .collect()
    }
    assert native == custom
