"""JSONL corpus ingest: explicit schema, corrupt lines quarantined not fatal.

Training corpora ship as JSON-lines (one doc per line, often gzip/zstd
per-file) — the same record shape the reference captures from its API
(fetch_youtube_data.py:129-141), but file-borne. Scale rules:

- **explicit schema, never inference**: schema inference is a full extra
  pass over 100 TB before the real read even starts, and a schema drift
  mid-corpus silently widens columns. The caller declares the schema; the
  reader enforces it.
- **PERMISSIVE + corrupt-record capture**: a 100 TB ingest WILL contain
  malformed lines; FAILFAST kills the job at hour N, DROPMALFORMED hides
  data loss. Instead malformed lines land in a quarantine column and are
  split out with their raw text preserved for replay (same first-class
  quarantine contract as operators/quarantine.py).
- line-splittable: uncompressed/zstd-seekable JSONL splits by line across
  tasks; one gzip file = one task, so shard compressed corpora into many
  files upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_record"


def _split_corrupt(df: "DataFrame") -> tuple["DataFrame", "DataFrame"]:
    """Split a PERMISSIVE read into (good, corrupt).

    The cache() is REQUIRED, not an optimization: Spark refuses a filter
    that references only the corrupt-record column of a fresh PERMISSIVE
    scan (the parse would be dead-code-eliminated), and the cache also
    guarantees both halves see one consistent parse. Lifecycle: the entry
    is scoped to the ingest — at 100 TB keep the quarantine column inline
    through the pipeline instead of splitting, or clearCache()/unpersist
    via the returned frames' storage after the split is consumed."""
    df = df.cache()
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    corrupt = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return good, corrupt


def read_csv_strict(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_jsonl`: declared schema, PERMISSIVE parse,
    malformed lines split out with raw text preserved for replay."""
    return _split_corrupt(
        spark.read.schema(f"{schema}, {_CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines under ``path`` with the declared ``schema``.

    Returns (good, corrupt): ``good`` carries the declared columns;
    ``corrupt`` has (raw_line) for every line that failed to parse as the
    declared schema. The two results partition the input lines."""
    return _split_corrupt(
        spark.read.schema(f"{schema}, {_CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
