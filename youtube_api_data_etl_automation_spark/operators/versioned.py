"""Reader-safe versioned parquet sinks: committed-version directories.

The reference's Postgres sink gives overwrite-style operations transactional
visibility for free (fetch_youtube_data.py:194,:198 — a reader sees the
table before or after the transaction, never mid-replace). The engine's
plain-parquet twins (operators/incremental.py::merge_upsert,
operators/layout.py::compact_small_files) use materialize-then-swap: crash
safe, but a reader racing the directory delete+rename can observe a partial
listing. At 100 TB with always-on readers that window is real.

This module closes it with the minimal table-format idea — an append-only
sequence of immutable version directories plus a commit marker:

    <base>/v=000000001/  part-*.parquet  _COMMITTED
    <base>/v=000000002/  part-*.parquet  _COMMITTED
    <base>/v=000000003/  part-*.parquet              <- crashed, unreadable

- A WRITER never mutates a committed version: it writes the full new state
  into the next ``v=N`` directory, then atomically creates the empty
  ``_COMMITTED`` marker (single-file create — the commit point).
- A READER lists the version dirs ONCE, picks the highest committed one,
  and reads only immutable files from it. Old-or-new, never in-between.
- A crash before the marker leaves an uncommitted dir that readers skip
  and the next writer reclaims (its ``mode("overwrite")`` clears it).
- Old versions are garbage-collected after ``keep_versions`` newer commits
  land; the default keeps the previous version alive so in-flight readers
  that resolved it finish safely (size the retention to reader runtime,
  exactly like table-format VACUUM horizons).

Single-writer-at-a-time per sink, like the reference's one daily ETL; for
concurrent writers use a real table format (this layout is deliberately the
same shape, so migration is mechanical). A further bonus over the in-place
twins: the writer reads the old version lazily while writing the new one —
no localCheckpoint materialization is needed because nothing overwrites
what is being read.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COMMITTED = "_COMMITTED"
_VERSION_RE = re.compile(r"^v=(\d{9})$")


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath, hpath.getFileSystem(spark._jsc.hadoopConfiguration())


def version_path(base_path: str, version: int) -> str:
    return f"{base_path.rstrip('/')}/v={version:09d}"


def list_versions(spark: SparkSession, base_path: str) -> list[tuple[int, bool]]:
    """All version dirs under ``base_path`` as (version, committed)."""
    jvm, hpath, fs = _fs(spark, base_path)
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        if not st.isDirectory():
            continue
        m = _VERSION_RE.match(st.getPath().getName())
        if not m:
            continue
        v = int(m.group(1))
        marker = jvm.org.apache.hadoop.fs.Path(
            version_path(base_path, v) + "/" + _COMMITTED
        )
        out.append((v, bool(fs.exists(marker))))
    return sorted(out)


def current_version(spark: SparkSession, base_path: str) -> int | None:
    """Highest COMMITTED version, or None for a fresh sink. Uncommitted
    (crashed-writer) dirs are invisible here by construction."""
    committed = [v for v, ok in list_versions(spark, base_path) if ok]
    return max(committed) if committed else None


def read_current(spark: SparkSession, base_path: str) -> DataFrame:
    """Snapshot-consistent read: resolve the committed version once, then
    scan only its immutable files. Raises on a sink with no commits."""
    v = current_version(spark, base_path)
    if v is None:
        raise FileNotFoundError(f"no committed version under {base_path}")
    return spark.read.parquet(version_path(base_path, v))


def commit_version(df: DataFrame, base_path: str, keep_versions: int = 2) -> int:
    """Write ``df`` as the next version and commit it. Returns the new
    version number. ``keep_versions`` committed versions are retained
    (current included); older ones are deleted AFTER the new commit, so a
    reader that resolved version N-1 before this commit still reads it in
    full with the default retention."""
    spark = df.sparkSession
    new_v = (current_version(spark, base_path) or 0) + 1
    vpath = version_path(base_path, new_v)
    # overwrite reclaims any uncommitted debris a crashed writer left here
    df.write.mode("overwrite").parquet(vpath)
    jvm, _, fs = _fs(spark, base_path)
    marker = jvm.org.apache.hadoop.fs.Path(vpath + "/" + _COMMITTED)
    fs.create(marker, True).close()  # atomic single-file create = commit
    # GC: drop committed versions older than the retention horizon.
    for v, ok in list_versions(spark, base_path):
        if ok and v <= new_v - keep_versions:
            p = jvm.org.apache.hadoop.fs.Path(version_path(base_path, v))
            fs.delete(p, True)
    return new_v


def overwrite_versioned(df: DataFrame, base_path: str,
                        keep_versions: int = 2) -> int:
    """Reader-safe full replace (the dimension-overwrite shape,
    reference :198). Alias of commit_version with intent in the name."""
    return commit_version(df, base_path, keep_versions)


def merge_upsert_versioned(updates: DataFrame, base_path: str, key: str,
                           keep_versions: int = 2) -> int:
    """Reader-safe MERGE upsert: same semantics as
    operators/incremental.py::merge_upsert (matched keys take the incoming
    row, unmatched sink rows kept, new keys inserted, duplicate update keys
    collapse to one arbitrary row) but published as a new committed
    version — a concurrent reader observes the pre- or post-merge state,
    never a partial directory. No localCheckpoint: the old version stays
    immutable while the new one is written, so the merge plan may read it
    lazily."""
    spark = updates.sparkSession
    updates = updates.dropDuplicates([key])
    if current_version(spark, base_path) is None:
        return commit_version(updates, base_path, keep_versions)
    existing = read_current(spark, base_path)
    kept = existing.join(F.broadcast(updates.select(key)), on=key, how="left_anti")
    merged = kept.unionByName(updates)
    return commit_version(merged, base_path, keep_versions)


def compact_versioned(spark: SparkSession, base_path: str,
                      target_mb: int = 128, sort_col: str | None = None,
                      compression: str = "zstd",
                      keep_versions: int = 2) -> dict:
    """Reader-safe small-file compaction: the maintenance rewrite of
    operators/layout.py::compact_small_files, published as a new committed
    version instead of a delete+rename swap. Without ``sort_col`` the
    rewrite is a narrow coalesce; with it, a range-cluster + sort so
    compaction doubles as re-clustering. Returns
    {files_before, files_after, bytes, version}."""
    v = current_version(spark, base_path)
    if v is None:
        raise FileNotFoundError(f"no committed version under {base_path}")
    vpath = version_path(base_path, v)
    jvm, hpath, fs = _fs(spark, vpath)
    total_bytes = fs.getContentSummary(hpath).getLength()
    files_before = sum(
        1
        for f in fs.listStatus(hpath)
        if f.isFile() and f.getPath().getName().endswith(".parquet")
    )
    chunk = target_mb * 1024 * 1024
    n_out = max(1, int(total_bytes // chunk) + (1 if total_bytes % chunk else 0))

    df = spark.read.parquet(vpath)
    if sort_col is None:
        out = df.coalesce(n_out)
    else:
        out = df.repartitionByRange(n_out, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    # commit_version writes uncompressed-option parquet; keep codec parity
    # with the layout writers by setting it on the session write below.
    spark_conf_key = "spark.sql.parquet.compression.codec"
    prev_codec = spark.conf.get(spark_conf_key)
    spark.conf.set(spark_conf_key, compression)
    try:
        new_v = commit_version(out, base_path, keep_versions)
    finally:
        spark.conf.set(spark_conf_key, prev_codec)
    _, new_hpath, _ = _fs(spark, version_path(base_path, new_v))
    files_after = sum(
        1
        for f in fs.listStatus(new_hpath)
        if f.isFile() and f.getPath().getName().endswith(".parquet")
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": int(total_bytes),
        "version": new_v,
    }


# ---------------------------------------------------------------------------
# Versioned incremental-aggregate state: fold + applied-marker in ONE commit
# ---------------------------------------------------------------------------

_STATE_SUB = "state"
_APPLIED_SUB = "applied"


def read_agg_state(spark: SparkSession, base_path: str) -> DataFrame:
    """Current committed aggregate state (see incremental_agg_versioned)."""
    v = current_version(spark, base_path)
    if v is None:
        raise FileNotFoundError(f"no committed version under {base_path}")
    return spark.read.parquet(f"{version_path(base_path, v)}/{_STATE_SUB}")


def incremental_agg_versioned(delta: DataFrame, base_path: str,
                              keys: list[str], sum_cols: list[str],
                              batch_id: str, keep_versions: int = 2) -> DataFrame:
    """operators/incremental.py::incremental_agg with its one documented
    unsafe window CLOSED: that protocol writes the folded state, THEN the
    applied-batch marker — a crash between the two makes the retry re-fold
    the batch once (double-count). Here the new state AND the full
    applied-batch-id set are written into the same ``v=N`` directory and
    committed by the single atomic ``_COMMITTED`` create, so state and
    markers can never disagree: a crash anywhere pre-marker leaves the old
    version current and the retry folds exactly once. This is the atomic
    state+marker commit the in-place docstring says needs a table format —
    the versioned layout IS that commit.

    ``batch_id`` is mandatory (the whole point is exactly-once folding).
    Re-folding an applied batch returns the current state, no new version.
    Algebraic aggregates only; decimal-exact sums keep the folded state
    bit-identical to a from-scratch recompute. Returns the new (or
    current) state DataFrame."""
    spark = delta.sparkSession
    cur = current_version(spark, base_path)
    old_state = old_applied = None
    if cur is not None:
        vdir = version_path(base_path, cur)
        old_state = spark.read.parquet(f"{vdir}/{_STATE_SUB}")
        old_applied = spark.read.parquet(f"{vdir}/{_APPLIED_SUB}")
        if (
            old_applied.filter(F.col("batch_id") == batch_id).limit(1).count()
            > 0
        ):
            return old_state

    aggs = [F.count(F.lit(1)).cast("long").alias("cnt")] + [
        F.sum(F.col(c).cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias(f"sum_{c}")
        for c in sum_cols
    ]
    part = delta.groupBy(*keys).agg(*aggs)
    if old_state is not None:
        merge_aggs = [F.sum("cnt").cast("long").alias("cnt")] + [
            F.sum(f"sum_{c}").cast("decimal(28,6)").alias(f"sum_{c}")
            for c in sum_cols
        ]
        part = old_state.unionByName(part).groupBy(*keys).agg(*merge_aggs)
    new_applied = spark.createDataFrame([(batch_id,)], "batch_id string")
    if old_applied is not None:
        new_applied = old_applied.unionByName(new_applied)

    new_v = (cur or 0) + 1
    vpath = version_path(base_path, new_v)
    # Old version stays immutable while both legs write — the fold may read
    # it lazily; no localCheckpoint materialization needed.
    part.write.mode("overwrite").parquet(f"{vpath}/{_STATE_SUB}")
    new_applied.write.mode("overwrite").parquet(f"{vpath}/{_APPLIED_SUB}")
    jvm, _, fs = _fs(spark, base_path)
    marker = jvm.org.apache.hadoop.fs.Path(vpath + "/" + _COMMITTED)
    fs.create(marker, True).close()  # the ONE commit point for both legs
    for v, ok in list_versions(spark, base_path):
        if ok and v <= new_v - keep_versions:
            p = jvm.org.apache.hadoop.fs.Path(version_path(base_path, v))
            fs.delete(p, True)
    return read_agg_state(spark, base_path)


# ---------------------------------------------------------------------------
# Versioned APPEND: manifest-listed immutable batches, O(delta) write cost
# ---------------------------------------------------------------------------

_MANIFEST = "manifest.json"


def _batch_dir(base_path: str, version: int) -> str:
    return f"{base_path.rstrip('/')}/batches/b={version:09d}"


def _read_manifest(spark: SparkSession, base_path: str, version: int) -> list[str]:
    import json

    jvm, _, fs = _fs(spark, base_path)
    mpath = jvm.org.apache.hadoop.fs.Path(
        f"{version_path(base_path, version)}/{_MANIFEST}"
    )
    stream = fs.open(mpath)
    try:
        # py4j passes byte[] by value, so a Python-side read loop can't
        # fill a buffer — let commons-io (on every Hadoop classpath) drain
        # the stream JVM-side and hand back the bytes.
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))["batches"]


def read_appended(spark: SparkSession, base_path: str) -> DataFrame:
    """Snapshot read of a versioned-APPEND sink: resolve the committed
    manifest once, scan exactly the batch directories it lists. A batch
    mid-write (or from a crashed append) is listed by no manifest and is
    invisible — the append-side twin of read_current's guarantee."""
    v = current_version(spark, base_path)
    if v is None:
        raise FileNotFoundError(f"no committed version under {base_path}")
    return spark.read.parquet(*_read_manifest(spark, base_path, v))


def append_versioned(delta: DataFrame, base_path: str, key: str | None = None,
                     keep_versions: int = 2) -> int:
    """Reader-safe idempotent APPEND. The overwrite-shaped versioned ops
    rewrite the full state per commit; an incremental sink can't afford
    that, and a plain ``mode("append")`` exposes racing readers to a
    half-written batch's files. This does neither: the delta lands in an
    immutable ``batches/b=N`` directory, and a new version commits a
    MANIFEST = previous manifest + the new batch — atomic visibility at
    O(delta) write cost, the same idea as a table format's snapshot +
    added-files commit.

    With ``key``, re-applies append_delta's idempotence protocol against
    the CURRENT snapshot (anti-join at write time), so retries and
    replayed batches land exactly once. Returns rows actually appended
    (0 ⇒ no new version committed). Read through :func:`read_appended`.
    GC removes expired version (manifest) dirs only; batch dirs stay while
    any retained manifest lists them — and since manifests only ever grow,
    every batch a live manifest lists is listed by the current one too."""
    from .incremental import select_new

    spark = delta.sparkSession
    cur = current_version(spark, base_path)
    old_batches: list[str] = [] if cur is None else _read_manifest(
        spark, base_path, cur
    )
    if key is not None and old_batches:
        delta = select_new(delta, read_appended(spark, base_path), key)
    delta = delta.localCheckpoint()
    n = delta.count()
    if n == 0:
        return 0

    new_v = (cur or 0) + 1
    bdir = _batch_dir(base_path, new_v)
    # overwrite reclaims a crashed append's orphan batch of the same slot
    delta.write.mode("overwrite").parquet(bdir)

    import json

    jvm, _, fs = _fs(spark, base_path)
    vdir = version_path(base_path, new_v)
    vpath_obj = jvm.org.apache.hadoop.fs.Path(vdir)
    if fs.exists(vpath_obj):
        fs.delete(vpath_obj, True)  # crashed-writer debris (no marker)
    manifest = json.dumps({"batches": old_batches + [bdir]}).encode("utf-8")
    out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{vdir}/{_MANIFEST}"), True)
    try:
        out.write(manifest)
    finally:
        out.close()
    marker = jvm.org.apache.hadoop.fs.Path(vdir + "/" + _COMMITTED)
    fs.create(marker, True).close()  # commit point
    for v, ok in list_versions(spark, base_path):
        if ok and v <= new_v - keep_versions:
            p = jvm.org.apache.hadoop.fs.Path(version_path(base_path, v))
            fs.delete(p, True)
    return n
