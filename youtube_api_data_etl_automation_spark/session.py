"""SparkSession factory.

Session policy (SURVEY.md §7.1 item 1):
- UTC session timezone — required for timestamp-part parity with the
  reference's UTC-pinned pandas parsing (fetch_youtube_data.py:179-182).
- AQE on: runtime join-strategy adaptation, skew-join splitting, and
  partition coalescing are the first line of defense at 100 TB scale.
- Arrow on: every mapInPandas/pandas_udf boundary is Arrow-batched.
- shuffle.partitions sized from the env (local test boxes want ~cores;
  a real cluster sets this per-job or relies on AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "youtube-etl-spark-engine", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession with the engine config applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r14: respect advisoryPartitionSizeInBytes when coalescing
        # instead of maximizing parallelism (the Spark-docs-recommended
        # setting). parallelismFirst=true re-expands every tiny shuffle
        # to ~core-count reduce tasks, pure scheduling overhead at any
        # scale where partitions land under the advisory size; at
        # 100 TB the advisory target (guide §2.2: 100 MB-1 GB
        # partitions) is what should govern, not the core count.
        # Measured at sf0.1: -23% across the shuffle-heavy rows
        # (semantic_neardup -31%, dedup_exact_docs -30%).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Runtime (bloom) join filters: for a selective dim-filtered join
        # the optimizer injects a bloom filter built from the dim side into
        # the fact scan — rows that can't join are dropped AT THE SCAN,
        # before the shuffle. At 100 TB this is often the difference between
        # shuffling the whole fact table and shuffling the matching slice.
        # (Creation thresholds still apply per-join; pinned in
        # tests/test_scale_plans.py.)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        # Sized for the test SF (compressed parquet ≤ ~11 MB/table): split
        # scans finely enough that per-row compute uses the cores. At cluster
        # scale with properly sized files, raise toward the 128m default —
        # the env override is the knob.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "2m"),
        )
        .config("spark.sql.files.openCostInBytes", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()


def ship_package(spark: SparkSession) -> None:
    """Make THIS package importable inside Spark's Python workers.

    Operators whose mapInPandas/pandas_udf closures reference
    module-level functions (the decode family: operators/jpeg.py,
    operators/gif.py, operators/multimodal.py, operators/mediameta.py)
    are pickled BY REFERENCE — the worker unpickles an import, so the
    worker must be able to import the package. A driver process rooted
    in the repo gets that for free (cwd on sys.path); an external
    harness makes no such promise. This ships a one-time zip of the
    package via ``sc.addPyFile`` — idempotent per SparkContext, ~100 ms,
    a few hundred KB. Data files (fixtures/) and caches are excluded:
    workers need code, the driver reads fixtures locally."""
    sc = spark.sparkContext
    if getattr(sc, "_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = [
                d for d in dirs if d not in ("__pycache__", "fixtures")
            ]
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                arc = os.path.join(
                    pkg_name, os.path.relpath(full, pkg_dir)
                )
                zf.write(full, arc)
    sc.addPyFile(zpath)
    sc._pkg_shipped = True
