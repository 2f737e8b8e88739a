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


def write_clustered(
    df: DataFrame,
    path: str,
    partition_col: str,
    sort_col: str,
    num_files: int,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_col``, with
    ``num_files`` range-clustered, internally-sorted files overall.

    zstd by default: ~snappy decode speed at clearly better ratio — at
    100 TB the codec choice is multiple PB-days of I/O per full pass."""
    (
        df.repartitionByRange(num_files, F.col(partition_col), F.col(sort_col))
        .sortWithinPartitions(partition_col, sort_col)
        .write.partitionBy(partition_col)
        .option("compression", compression)
        .mode(mode)
        .parquet(path)
    )
