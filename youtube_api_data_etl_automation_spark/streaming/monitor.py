"""Streaming drift monitoring: per-micro-batch PSI against a committed
baseline.

The batch drift family (operators/profile.py::histogram_drift,
operators/versioned.py::psi_between_versions) answers "did the NEW VERSION
move?"; this answers the always-on form — "is the feed drifting RIGHT
NOW?" — by scoring every arriving micro-batch against a fixed baseline
histogram and appending one verdict row per batch to a monitoring sink a
dashboard/alert job tails.

Composition, not new math: each micro-batch runs the SAME
``numeric_histogram`` (one column-pruned pass over the batch) and the same
``histogram_drift`` PSI (a ≤bins-row join) as the batch operators, inside
``foreachBatch``. The baseline is an ordinary ≤bins-row DataFrame — built
once from a reference window (or read back from a committed profile) and
reused across every batch; at 100 TB of stream the per-batch cost is one
aggregation of the batch plus bins-row arithmetic, and the monitoring sink
grows one row per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def monitor_stream_drift(
    stream_df: DataFrame,
    baseline_hist: DataFrame,
    checkpoint_dir: str,
    sink_path: str,
    *,
    col: str,
    lo: float,
    hi: float,
    bins: int,
    psi_threshold: float = 0.2,
) -> None:
    """Drain ``stream_df`` (``trigger(availableNow=True)``), scoring each
    micro-batch's ``col`` distribution against ``baseline_hist`` (a
    :func:`..operators.profile.numeric_histogram` relation on the SAME
    (lo, hi, bins) grid — grid mismatches raise inside histogram_drift)
    and appending one verdict row per batch to ``sink_path``:
    ``(batch_id, column_name, psi, n_buckets, prev_total, cur_total,
    flagged)``. Empty micro-batches append nothing (an empty feed is a
    liveness problem, not distribution drift — alert on sink silence,
    not on a meaningless PSI against zero mass).

    Restart semantics: the checkpoint skips already-processed batches, so
    verdict rows are not duplicated on resume; a batch replayed after a
    crash-before-commit may append its verdict twice — dedup on
    (batch_id) downstream if exact-once verdicts matter more than a
    1-row-per-crash overcount."""
    from ..operators.profile import histogram_drift, numeric_histogram

    # capture a stable ≤bins-row local copy: re-evaluating an arbitrary
    # baseline lineage per micro-batch would re-run its source scans
    # every batch
    baseline_rows = baseline_hist.collect()
    schema = baseline_hist.schema

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        baseline = spark.createDataFrame(baseline_rows, schema)
        cur = numeric_histogram(batch, col, lo, hi, bins)
        verdict = histogram_drift(
            cur, baseline, psi_threshold=psi_threshold
        ).select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            F.lit(col).alias("column_name"),
            "psi",
            "n_buckets",
            "prev_total",
            "cur_total",
            "flagged",
        )
        verdict.write.mode("append").parquet(sink_path)

    q = (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle_batch)
        .start()
    )
    q.awaitTermination()


def monitor_stream_drift_from_state(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    sink_path: str,
    *,
    col: str,
    psi_threshold: float = 0.2,
) -> None:
    """:func:`monitor_stream_drift` with the baseline read off a committed
    profile-state sink (``versioned.incremental_profile_versioned`` with
    ``hist_specs=``): the grid comes from the state itself, so the stream
    is scored on exactly the histogram the batch pipeline maintains — one
    baseline for batch gates (``psi_vs_hist_state``), version drift, and
    the always-on monitor. Reads the ≤bins-row committed shape once at
    start; restart the monitor to pick up a newer committed baseline."""
    from ..operators.versioned import read_hist_state
    from ..operators.profile import hist_from_state

    state = read_hist_state(stream_df.sparkSession, state_dir)
    grid = (
        state.filter(F.col("column_name") == col)
        .select("grid_lo", "grid_hi", "grid_bins")
        .limit(1)
        .collect()
    )
    if not grid:
        raise KeyError(f"no committed histogram state for column {col!r}")
    monitor_stream_drift(
        stream_df,
        hist_from_state(state, col),
        checkpoint_dir,
        sink_path,
        col=col,
        lo=grid[0]["grid_lo"],
        hi=grid[0]["grid_hi"],
        bins=int(grid[0]["grid_bins"]),
        psi_threshold=psi_threshold,
    )


def profile_stream_to_state(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    cols: list[str] | None = None,
    *,
    hist_specs: list[tuple[str, float, float, int]] | None = None,
    topk_specs: list[tuple[str, int]] | None = None,
    batch_id_prefix: str = "stream",
) -> None:
    """Maintain the committed profile state FROM A STREAM: drain
    (``availableNow``) folding every micro-batch into the versioned
    profile state (``versioned.incremental_profile_versioned`` — moments
    + optional histogram shapes + optional heavy-hitter rows, one atomic
    commit per batch).

    Exactly-once twice over: the checkpoint skips processed batches on
    resume, AND the fold's applied-batch markers make even a replay from
    a LOST checkpoint idempotent — micro-batch ids restart at 0, the
    marker for ``{prefix}-0`` already exists, and the refold is a no-op.
    That is strictly stronger than the usual foreachBatch contract
    (where a replayed batch re-appends), and it falls out of reusing the
    batch-gate protocol instead of a bare write. Empty batches commit
    nothing. The resulting state feeds the same readouts as the batch
    path: ``profile --state-dir --report``, ``psi_vs_hist_state``,
    :func:`monitor_stream_drift_from_state`."""
    from ..operators.versioned import incremental_profile_versioned

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        incremental_profile_versioned(
            batch,
            state_dir,
            cols,
            batch_id=f"{batch_id_prefix}-{batch_id}",
            hist_specs=hist_specs,
            topk_specs=topk_specs,
        )

    q = (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle_batch)
        .start()
    )
    q.awaitTermination()
