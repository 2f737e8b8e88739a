"""Incremental-load protocol — the reference pipeline's core relational op.

The reference hand-rolls a broadcast hash anti-join: build a Python set of
existing keys (fetch_youtube_data.py:158) and probe it in a list-comp (:160),
then short-circuits the whole pipeline on an empty delta (:164-165).

Spark-first restatement (SURVEY.md §2.3 J1, §2.2 P5, §7.1 item 5):
- ``select_new`` is a LEFT ANTI join on the key. The existing-keys side is a
  key-only projection (the reference's manual ``SELECT videoid`` pushdown at
  :155 — Catalyst's ColumnPruning does it from ``.select(key)``). When the
  existing-keys side is small we broadcast it, which is exactly the
  reference's set-probe strategy distributed: no shuffle of the candidate
  side at all. At 100 TB the candidate side never moves — only keys do.
- ``is_empty`` keeps the reference's eager gate: it's the one place the
  engine deliberately materializes early, because it decides whether the
  expensive downstream fetch/transform runs at all.
- ``append_delta`` re-checks keys *inside* the write (anti-join against the
  sink at write time) so re-runs after partial failure stay idempotent —
  fixing the reference's non-transactional append (SURVEY.md §7.4 item 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_exists(spark, sink_path: str) -> bool:
    """Sink-exists probe (S5) as a REAL existence check — the Hadoop
    FileSystem the session would read through — instead of try/except
    around the read, which would silently treat corrupt files or
    permission errors as 'first run' and overwrite-by-append. (For
    catalog-managed tables the probe is ``spark.catalog.tableExists``;
    the engine's own state is a path-addressed parquet sink.)"""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(sink_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(path))


def select_new(candidates: DataFrame, existing: DataFrame, key: str,
               broadcast_existing: bool = True) -> DataFrame:
    """Rows of ``candidates`` whose ``key`` is absent from ``existing``.

    ``existing`` is pruned to the key column before the join so only keys
    ever cross the wire; with ``broadcast_existing`` Catalyst plans a
    BroadcastHashJoin(LeftAnti) — the shuffle-free plan. No dedup of the
    keys side: anti-join semantics are unaffected by build-side duplicates
    (the hash table dedups implicitly), and an explicit dropDuplicates
    would cost a full shuffle of the keys.
    """
    keys = existing.select(key)
    if broadcast_existing:
        keys = F.broadcast(keys)
    return candidates.join(keys, on=key, how="left_anti")


def is_empty(df: DataFrame) -> bool:
    """Empty-delta gate (eager by design — it gates the downstream job)."""
    return df.isEmpty()


def append_delta(delta: DataFrame, sink_path: str, key: str) -> int:
    """Idempotent append: re-filter against current sink keys, then append.
    Returns the number of rows actually written — on a retry after partial
    failure this can be less than the incoming delta, and callers must report
    THIS count, not the pre-filter one.

    The count comes from materializing the filtered delta (localCheckpoint)
    before the write: counting after the append would re-run the anti-join
    against the sink it just extended and see 0.

    Parquet-dir sink for the engine's own state; `jdbc.append_delta_jdbc`
    is the same protocol over a database sink.
    """
    spark = delta.sparkSession
    if sink_exists(spark, sink_path):
        existing = spark.read.parquet(sink_path)
        delta = select_new(delta, existing, key)
    delta = delta.localCheckpoint()
    n = delta.count()
    if n > 0:
        delta.write.mode("append").parquet(sink_path)
    return n


def overwrite_dim(dim: DataFrame, sink_path: str) -> None:
    """Full-replace dimension write (reference's channel_stats at :198)."""
    dim.write.mode("overwrite").parquet(sink_path)


def _applied_batches_path(state_path: str) -> str:
    return state_path.rstrip("/") + ".__applied__"


def incremental_agg(delta: DataFrame, state_path: str, keys: list[str],
                    sum_cols: list[str],
                    batch_id: str | None = None) -> DataFrame:
    """Incremental materialized-aggregate maintenance: keep per-key
    (count, sums…) state current by folding in each delta batch WITHOUT
    rescanning history — the scale answer to 'recompute the daily rollup
    over 100 TB every night'. Algebraic aggregates only (count/sum — and
    anything derivable from them: avg = sum/cnt); their partial states
    merge by addition, so

        new_state = reaggregate(old_state ∪ partial_agg(delta))

    touches |state| + |delta| rows, never the full history. Decimal-exact
    sums keep the folded state bit-identical to a from-scratch recompute
    (double addition would drift with batch order).

    Same materialize-then-overwrite protocol as merge_upsert; returns the
    new state DataFrame. State schema: keys + ``cnt`` + one ``sum_<c>``
    per sum column.

    Retry safety: unlike append_delta (whose key filter makes re-runs
    no-ops), a fold has no per-row identity to re-check — so pass a
    ``batch_id``. Applied ids are recorded in a sidecar
    (``<state>.__applied__``); re-folding an already-applied batch is
    skipped and returns the current state unchanged. Without a batch_id
    the fold is NOT idempotent under retries. The crash window between
    the state write and the marker write (see the comment at the marker
    below) is CLOSED by operators/versioned.py::incremental_agg_versioned,
    which commits state + applied ids under one atomic marker."""
    spark = delta.sparkSession
    applied_path = _applied_batches_path(state_path)
    state_present = sink_exists(spark, state_path)
    if batch_id is not None and sink_exists(spark, applied_path):
        if not state_present:
            # The state was deleted/rebuilt but its marker sidecar
            # survived: stale ids would silently skip legitimate re-folds
            # (or crash reading the absent state). A missing state voids
            # the markers — drop the sidecar and fold fresh.
            jvm = spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(applied_path)
            p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)
        else:
            applied = spark.read.parquet(applied_path)
            if applied.filter(F.col("batch_id") == batch_id).limit(1).count() > 0:
                return spark.read.parquet(state_path)
    aggs = [F.count(F.lit(1)).cast("long").alias("cnt")] + [
        F.sum(F.col(c).cast("decimal(28,6)")).cast("decimal(28,6)").alias(f"sum_{c}")
        for c in sum_cols
    ]
    part = delta.groupBy(*keys).agg(*aggs)
    if sink_exists(spark, state_path):
        old = spark.read.parquet(state_path)
        merge_aggs = [F.sum("cnt").cast("long").alias("cnt")] + [
            F.sum(f"sum_{c}").cast("decimal(28,6)").alias(f"sum_{c}")
            for c in sum_cols
        ]
        part = old.unionByName(part).groupBy(*keys).agg(*merge_aggs)
    state = part.localCheckpoint()
    state.write.mode("overwrite").parquet(state_path)
    if batch_id is not None:
        # Marker AFTER the state write. This narrows the unsafe window to
        # the instant between the two writes (crash there → the retry
        # re-folds once) but does not eliminate it — recording the marker
        # FIRST would be worse (crash after marker, before state → batch
        # silently dropped forever). Closing the window fully needs an
        # atomic commit of state+marker: a table format's transactional
        # MERGE, which this protocol maps onto directly.
        spark.createDataFrame([(batch_id,)], "batch_id string").write.mode(
            "append"
        ).parquet(applied_path)
    return state


def merge_upsert(updates: DataFrame, sink_path: str, key: str) -> None:
    """MERGE-style upsert over the parquet state: matched keys take the
    incoming row, unmatched sink rows are kept, new keys are inserted —
    `WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT` semantics without a
    table format (SURVEY.md §7.4 item 2's scale path; on Delta/Iceberg
    this becomes a real transactional MERGE with file-level pruning).

    Write protocol: materialize the merged result BEFORE touching the sink
    (localCheckpoint), then overwrite — the read and the overwrite cannot
    race because nothing reads lazily from the sink at write time. Updates
    with duplicate keys keep an arbitrary row (dropDuplicates), matching
    the reference's dedup policy (SURVEY.md §2.6 item 8).

    LIMITATION: crash-safe but not reader-safe — a CONCURRENT reader racing
    the overwrite can observe a partial file listing (the reference's
    Postgres sink is transactional here, :194/:198). With always-on
    readers use operators/versioned.py::merge_upsert_versioned — identical
    semantics published as a committed version directory, old-or-new
    visibility guaranteed.
    """
    spark = updates.sparkSession
    updates = updates.dropDuplicates([key])
    if not sink_exists(spark, sink_path):
        updates.write.mode("overwrite").parquet(sink_path)  # first run
        return
    existing = spark.read.parquet(sink_path)
    kept = existing.join(F.broadcast(updates.select(key)), on=key, how="left_anti")
    merged = kept.unionByName(updates).localCheckpoint()
    merged.write.mode("overwrite").parquet(sink_path)
