"""Watermark semantics (late data actually dropped) and mergeable-sketch
accuracy — the two behaviors the oracle harness can't check directly."""

from __future__ import annotations

import os
import tempfile
from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_watermark_drops_late_rows(spark):
    """Two micro-batches: batch 2 carries a row 10 hours older than batch
    1's max event time. With a 1-hour watermark the late row must NOT
    appear in any window emitted after it — bounded state means late data
    is discarded, the property that keeps streaming aggregation state
    finite at 100 TB/day ingest."""
    src = tempfile.mkdtemp(prefix="late_events_")
    schema = "ts timestamp, k string, v long"
    str_schema = "ts string, k string, v long"
    early = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a", 1), ("2024-01-01 12:00:00", "a", 1)],
        str_schema,
    ).selectExpr("CAST(ts AS TIMESTAMP) ts", "k", "v")
    late = spark.createDataFrame(
        [("2024-01-01 02:00:00", "a", 100), ("2024-01-01 12:30:00", "a", 1)],
        str_schema,
    ).selectExpr("CAST(ts AS TIMESTAMP) ts", "k", "v")
    early.coalesce(1).write.parquet(os.path.join(src, "d1"))
    late.coalesce(1).write.parquet(os.path.join(src, "d2"))
    flat = tempfile.mkdtemp(prefix="late_flat_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")

    def drain(tag: str) -> dict:
        stream = spark.readStream.schema(schema).parquet(flat)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "k")
            .agg(F.sum("v").alias("total"))
            .select(F.col("w.start").alias("ws"), "k", "total")
        )
        emitted: list = []

        def collect_batch(batch, _bid):
            emitted.extend(batch.collect())

        q = (
            agg.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .foreachBatch(collect_batch)
            .start()
        )
        q.awaitTermination()
        return {r["ws"].isoformat(): r["total"] for r in emitted}

    def add(d: str, prefix: str) -> None:
        f = [x for x in os.listdir(os.path.join(src, d)) if x.endswith(".parquet")][0]
        os.rename(os.path.join(src, d, f), os.path.join(flat, f"{prefix}_{f}"))

    # Run 1: only the early file — advances the watermark to 11:00
    # (12:00 max − 1 h) in the checkpointed state.
    add("d1", "0")
    out1 = drain("r1")
    # Run 2 (same checkpoint): the 02:00/v=100 row is now 9 h behind the
    # watermark and must be discarded; 12:30 is accepted.
    add("d2", "1")
    out2 = drain("r2")
    combined = {**out1, **out2}
    assert all(t < 100 for t in combined.values()), (out1, out2)
    # Sanity: the non-late path did emit something.
    assert combined, (out1, out2)


def test_approx_count_distinct_tracks_exact(spark):
    """HLL++ sketch: mergeable partial aggregation (the 100 TB path for
    count-distinct) must land within its rsd envelope of the exact count."""
    ev = load_table(spark, SF_DIR, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.1 * row["exact"]), row
    # Determinism: sketch result is merge-order independent.
    again = ev.repartition(3).agg(F.approx_count_distinct("user_id", 0.02)).first()[0]
    assert again == row["approx"]


def test_sliding_window_counts_match_batch_expansion(spark):
    """Sliding windows (1 h window / 30 min slide) through the streaming
    engine: each event must land in exactly window/slide = 2 windows. The
    batch oracle replays the expansion (every event assigned to its bucket
    and the bucket 30 min earlier). Registered-query coverage for this
    moved into the consolidated registry's tumbling query; the slide
    semantics are pinned here."""
    import tempfile
    import uuid

    from youtube_api_data_etl_automation_spark.streaming.ingest import (
        read_events_stream,
        run_available_now,
        tumbling_event_counts,
    )

    name = f"slide_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, SF_DIR)
    agg = tumbling_event_counts(stream, window="1 hour", watermark="2 hours", slide="30 minutes")
    run_available_now(agg, tempfile.mkdtemp(prefix="ckpt_"), name)
    got = {
        (r.window_start_us, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table(name).collect()
    }

    ev = load_table(spark, SF_DIR, "events")
    bucket = F.timestamp_micros(
        (F.unix_micros("ts") / (30 * 60 * 1_000_000)).cast("long") * (30 * 60 * 1_000_000)
    )
    e = ev.select(bucket.alias("b"), "event_type", "value")
    expanded = e.select(F.col("b").alias("ws"), "event_type", "value").unionByName(
        e.select(
            (F.timestamp_micros(F.unix_micros("b") - 30 * 60 * 1_000_000)).alias("ws"),
            "event_type",
            "value",
        )
    )
    want = {
        (r.ws_us, r.event_type): (r.n_events, r.sum_value)
        for r in expanded.groupBy(F.unix_micros("ws").alias("ws_us"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert got == want
