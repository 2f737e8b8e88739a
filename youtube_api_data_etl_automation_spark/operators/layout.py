"""Write-side data layout: partitioned, range-clustered, sorted parquet.

At 100 TB the sink layout decides every future scan's cost (SURVEY.md §7.4
— the reference appends blindly to Postgres, fetch_youtube_data.py:194):

- **directory partitioning** on a coarse key (day) → partition pruning
  turns full-table scans into single-day reads (pinned by
  tests/test_scale_plans.py::test_partition_pruning);
- **range clustering** on a fine key within each directory → each file owns
  a disjoint slice of the sort key, so parquet row-group min/max stats
  skip whole files for point/range predicates;
- **in-file sort** → row-group stats stay tight and delta/run-length
  encodings compress the sort column.

``repartitionByRange(partition, sort)`` makes each task hold one contiguous
(partition, sort) slice, so ``partitionBy`` emits ~one file per task per
directory instead of ``tasks × directories`` fragments — the classic
small-files blowup that kills 100 TB listings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_manifest(spark, path: str, *stat_cols: str) -> DataFrame:
    """Per-file manifest of a parquet dataset: (file, n_rows, and min/max
    of each ``stat_col``) — the artifact an external catalog or reader
    uses for file-level skipping without opening footers, and the audit
    that proves a clustered/z-ordered layout actually has the disjoint
    spans it promises. One distributed pass (groupBy input_file_name);
    no driver-side listing."""
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(F.col("_file").alias("file")).agg(*aggs)


def compact_small_files(spark, path: str, target_mb: int = 128,
                        sort_col: str | None = None,
                        compression: str = "zstd") -> dict:
    """Small-file compaction — the maintenance op every incremental sink
    needs: micro-batch appends (operators/incremental.py::append_delta
    writes one file set per batch) accumulate thousands of KB-scale files,
    and at 100 TB the file *listing* alone starts to dominate scan setup.
    Rewrites the directory into ⌈total_bytes / target⌉ files.

    - Without ``sort_col``: ``coalesce`` — a NARROW dependency, so the
      rewrite moves no data between executors (each output task
      concatenates whole input partitions). The cheapest possible rewrite.
    - With ``sort_col``: range-cluster + sort (one shuffle) so compaction
      doubles as re-clustering — disjoint per-file spans for min/max
      skipping (same layout write_clustered produces).

    Write protocol: stage to ``<path>.__compact__``, then delete + rename
    with every FS return value CHECKED — a failed swap raises with the
    staged path intact (nothing lost; re-runnable), it never reports
    success stats over a broken sink. Directory-PARTITIONED sinks
    (write_clustered output) are refused: a flat rewrite would silently
    destroy the partition layout — compact each leaf directory instead.

    LIMITATION: crash-safe but not reader-safe — a concurrent reader can
    catch the delete+rename window and see a partial listing. Sinks with
    always-on readers should use operators/versioned.py::compact_versioned
    (committed version dirs: readers observe old-or-new, never mid-swap).

    Returns {files_before, files_after, bytes}."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    staged_prev = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__compact__")
    if not fs.exists(hpath) and fs.exists(staged_prev):
        # Crash-recovery: a previous run deleted the sink but died before
        # the rename — complete the swap instead of crashing on listStatus,
        # making the "re-run to retry" contract real.
        if not fs.rename(staged_prev, hpath):
            raise IOError(
                f"compaction recovery: rename {staged_prev} -> {path} failed again"
            )
        n = sum(
            1
            for f in fs.listStatus(hpath)
            if f.isFile() and f.getPath().getName().endswith(".parquet")
        )
        return {"files_before": 0, "files_after": n,
                "bytes": int(fs.getContentSummary(hpath).getLength())}
    statuses = list(fs.listStatus(hpath))
    if any(s.isDirectory() for s in statuses):
        raise ValueError(
            f"{path} contains subdirectories (directory-partitioned sink); "
            "flat compaction would flatten the partition layout — compact "
            "each partition directory instead"
        )
    total_bytes = fs.getContentSummary(hpath).getLength()
    files_before = sum(
        1
        for f in statuses
        if f.isFile() and f.getPath().getName().endswith(".parquet")
    )
    n_out = max(1, int(total_bytes // (target_mb * 1024 * 1024)) + (
        1 if total_bytes % (target_mb * 1024 * 1024) else 0
    ))

    df = spark.read.parquet(path)
    staged = path.rstrip("/") + ".__compact__"
    if sort_col is None:
        # coalesce can only DECREASE partition count: when the requested
        # file count exceeds the scan's partitioning (target_mb below
        # spark.sql.files.maxPartitionBytes), it would silently emit
        # maxPartitionBytes-sized files while reporting success (r6
        # review) — splitting needs a real repartition.
        n_scan = df.rdd.getNumPartitions()
        out = df.coalesce(n_out) if n_out <= n_scan else df.repartition(n_out)
    else:
        out = df.repartitionByRange(n_out, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    # Same codec default as every writer in this module: a zstd sink must
    # not silently become snappy after maintenance (and n_out was sized
    # from zstd byte counts).
    out.write.mode("overwrite").option("compression", compression).parquet(staged)

    spath = jvm.org.apache.hadoop.fs.Path(staged)
    if not fs.delete(hpath, True):
        raise IOError(f"compaction: could not delete {path} (staged data kept at {staged})")
    if not fs.rename(spath, hpath):
        raise IOError(
            f"compaction: rename {staged} -> {path} failed (staged data kept; "
            "sink path is currently absent — re-run to retry the swap)"
        )
    files_after = sum(
        1
        for f in fs.listStatus(hpath)
        if f.isFile() and f.getPath().getName().endswith(".parquet")
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": int(total_bytes),
    }


def zorder_key(col_a: F.Column, col_b: F.Column, bits: int = 16) -> F.Column:
    """Morton (Z-order) interleave of two normalized integer keys.

    Inputs must already be in [0, 2^bits); the result interleaves their
    bits (a→even positions, b→odd) into one long. Sorting by this key
    gives every output file a bounded span in BOTH dimensions — the
    multi-column data-skipping layout a single-key range cluster cannot
    provide (its second column spans the full range in every file).
    Pure bit-arithmetic Column expression: codegen'd, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(col_a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(col_b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def normalize_to_bits(col: F.Column, lo: float, hi: float, bits: int = 16) -> F.Column:
    """Map a numeric column into [0, 2^bits) by linear min/max scaling —
    the per-column quantization feeding zorder_key. lo/hi come from a
    one-row stats aggregate (driver-side control data, like the reference's
    own source-control collects)."""
    span = max(hi - lo, 1e-12)
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(span)
    top = (1 << bits) - 1
    return F.least(
        F.lit(top).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(scaled * F.lit(top + 1)).cast("long")),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int,
    bits: int = 16,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Z-order-clustered parquet on two predicate columns: range-partition
    and sort by the Morton key so parquet file/row-group min-max stats can
    skip files for selective predicates on EITHER column (each file covers
    ~a square cell of the 2-D key space instead of a full-width stripe).
    The min/max stats pass is one tiny aggregate; everything else is the
    same single repartitionByRange + sorted write as write_clustered."""
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(col_a).alias("a_lo"), F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"), F.max(col_b).alias("b_hi"),
    ).first()
    if stats["n"] == 0:
        # Empty input: no key space to interleave — write the empty sink
        # instead of crashing on float(None).
        df.write.option("compression", compression).mode(mode).parquet(path)
        return
    if stats["a_lo"] is None or stats["b_lo"] is None:
        # Non-empty input with an all-NULL key column: silently skipping
        # the clustering would violate the layout contract — fail loudly
        # (z-order a backfilled column, or use write_clustered on the
        # non-NULL key).
        raise ValueError(
            f"write_zordered: key column {'col_a' if stats['a_lo'] is None else 'col_b'} "
            f"({col_a if stats['a_lo'] is None else col_b}) is entirely NULL — "
            "cannot interleave a keyless dimension"
        )
    z = zorder_key(
        normalize_to_bits(F.col(col_a), float(stats["a_lo"]), float(stats["a_hi"]), bits),
        normalize_to_bits(F.col(col_b), float(stats["b_lo"]), float(stats["b_hi"]), bits),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.option("compression", compression)
        .mode(mode)
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    partition_col: str,
    sort_col: str,
    num_files: int,
    mode: str = "overwrite",
    compression: str = "zstd",
    file_format: str = "parquet",
) -> None:
    """Write ``df`` partitioned by ``partition_col``, with ``num_files``
    range-clustered, internally-sorted files overall. ``file_format`` is
    any Spark file sink ("parquet" default; "orc" keeps the identical
    layout/stats story on ORC-standardized warehouses — both formats carry
    the min/max stats the clustering exists for).

    zstd by default: ~snappy decode speed at clearly better ratio — at
    100 TB the codec choice is multiple PB-days of I/O per full pass."""
    (
        df.repartitionByRange(num_files, F.col(partition_col), F.col(sort_col))
        .sortWithinPartitions(partition_col, sort_col)
        .write.partitionBy(partition_col)
        .option("compression", compression)
        .mode(mode)
        .format(file_format)
        .save(path)
    )
