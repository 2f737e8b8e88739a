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


def _strip_nullability(dt):
    """Recursively force every nullability flag (struct-field nullable,
    array containsNull, map valueContainsNull) to True so the drift check
    compares VALUE TYPES only: a file written when an array element was
    provably non-null is still the same data as the contract's nullable
    form — only genuine type conflicts should hard-error."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _strip_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_strip_nullability(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _strip_nullability(dt.keyType), _strip_nullability(dt.valueType), True
        )
    return dt


def read_parquet_evolving(spark: SparkSession, path: str,
                          expected_schema) -> DataFrame:
    """Schema-drift-tolerant parquet read for sinks written across schema
    versions (backfills, upstream producers adding/retiring fields — the
    normal state of a long-lived 100 TB sink):

    - ``mergeSchema=true`` unions the per-file footers (files written
      before a column existed simply yield NULLs for it);
    - columns the caller expects but NO file carries are added as typed
      NULLs, so downstream plans never break on a not-yet-backfilled
      field;
    - columns present on disk but absent from ``expected_schema`` are
      DROPPED (forward-compat: an upstream producer's new experimental
      field doesn't leak into consumers pinned to the contract);
    - a type mismatch on an expected column is a hard error — silent
      try_cast here would hide real producer bugs (the quarantine path is
      for row-level corruption, not schema-level drift).

    ``expected_schema`` is a StructType or DDL string. Returns columns in
    the expected order."""
    from pyspark.sql import types as T

    if isinstance(expected_schema, str):
        expected_schema = T._parse_datatype_string(expected_schema)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    # Case-INSENSITIVE resolution, matching Spark's default analyzer: a
    # producer whose column case drifted ('Score' vs 'score') must resolve
    # to the real data, not silently NULL-fill the contract column.
    on_disk = {f.name.lower(): f for f in df.schema.fields}
    cols = []
    for field in expected_schema.fields:
        disk_field = on_disk.get(field.name.lower())
        if disk_field is not None:
            if _strip_nullability(disk_field.dataType) != _strip_nullability(
                field.dataType
            ):
                raise TypeError(
                    f"schema drift on {field.name!r}: sink has "
                    f"{disk_field.dataType.simpleString()}, contract expects "
                    f"{field.dataType.simpleString()} — refusing a silent cast; "
                    "fix the producer or migrate the sink"
                )
            cols.append(F.col(disk_field.name).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
