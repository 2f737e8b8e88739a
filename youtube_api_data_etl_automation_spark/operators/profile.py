"""Single-pass table profiling: per-column stats, fixed-grid histograms,
top-k frequent values.

The reference pipeline has no data-quality surface at all — it trusts the
API payload and crashes on surprises (SURVEY.md §2.6; e.g. the unguarded
duration parse, fetch_youtube_data.py:184-186). At 100 TB the first step of
any ingest/curation run is a cheap profile of what actually arrived: null
rates, cardinalities, ranges, value skew. These operators are that step,
built so the whole per-column stats block is ONE aggregate job over ONE scan
of the table.

Scale notes
-----------
- ``column_stats`` with ``exact_distinct=True`` uses one COUNT(DISTINCT)
  per column; Spark plans multi-distinct aggregates with an Expand (each
  input row replicated once per distinct column before the partial
  aggregate) — still a single scan, but the shuffle carries ``n_cols×``
  rows and the plan needs a second exchange for the distinct stage. That
  is the fixture/oracle mode. At 100 TB set ``exact_distinct=False``:
  approx_count_distinct (HyperLogLog++) partials merge associatively, the
  Expand and the extra exchange disappear, and the single shuffle carries
  one tiny sketch per partition per column.
- ``numeric_histogram`` groups on at most ``bins`` keys — map-side partial
  aggregation reduces the shuffle to ``bins`` rows per partition.
- ``top_values`` aggregates (value, count) then takes the global top-k via
  ``orderBy().limit(k)``, which Spark executes as TakeOrderedAndProject:
  per-partition top-k then a k-row merge on the driver — no full sort, no
  full shuffle of the counts relation.

Cross-engine determinism (the driver's DuckDB oracle): min/max are emitted
as strings only for types whose rendering is identical in both engines
(integers, strings, dates); fractional columns are first cast to
decimal(24,6) (exact at the ≤2-decimal magnitudes of the test data) and
timestamps are formatted with an explicit pattern, so no engine-specific
float/timestamp formatting ever reaches the compared values. Means are
decimal-exact sums divided at the edge and rounded with the portable
``round6``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.rounding import round6

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType)

STATS_FIELDS = (
    "column_name",
    "dtype",
    "n_rows",
    "n_nulls",
    "n_distinct",
    "min_value",
    "max_value",
    "avg_value",
    "avg_len",
)


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, _INTEGRAL + _FRACTIONAL) or isinstance(dt, T.DecimalType)


def _ref(name: str) -> Column:
    """Reference a column by its LITERAL name: a profiled source can carry
    dotted or otherwise exotic column names (flattened JSON ingest), which
    bare F.col/df[...] would parse as nested-field access. Backtick
    quoting (with `` escaping) makes the reference verbatim."""
    return F.col("`" + name.replace("`", "``") + "`")


def column_stats(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """One row per profiled column: ``(column_name, dtype, n_rows, n_nulls,
    n_distinct, min_value, max_value, avg_value, avg_len)``.

    One aggregate job, one scan — every per-column metric is a column of the
    same wide agg, then the single result row is unpivoted driver-free via
    ``inline``. NULL policy: ``n_nulls`` counts them, every other metric
    ignores them (min/max/avg over the non-null subset); an all-NULL or
    empty column yields NULL min/max/avg and ``n_distinct = 0``.

    ``min_value``/``max_value`` are portable strings (see module note);
    types without a stable cross-engine rendering (arrays, structs, maps,
    binary) get NULL min/max rather than an engine-specific repr.
    ``avg_value`` is populated for numeric columns, ``avg_len`` (mean
    string length) for string columns; both decimal-exact then round6.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        names = [f.name for f in df.schema.fields]
    else:
        missing = [c for c in cols if c not in fields]
        if missing:
            raise KeyError(f"unknown columns {missing}; table has {sorted(fields)}")
        names = list(cols)

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(names):
        dt = fields[c]
        col = _ref(c)  # verbatim name; internal agg aliases are positional
        aggs.append(F.count(col).alias(f"__p{i}__nn"))
        nd = F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)
        aggs.append(nd.cast("long").alias(f"__p{i}__nd"))
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            mn = F.date_format(F.min(col), timestamp_format)
            mx = F.date_format(F.max(col), timestamp_format)
        elif isinstance(dt, _FRACTIONAL):
            mn = F.min(col).cast("decimal(24,6)").cast("string")
            mx = F.max(col).cast("decimal(24,6)").cast("string")
        elif isinstance(
            dt, _INTEGRAL + (T.StringType, T.DateType, T.BooleanType, T.DecimalType)
        ):
            mn = F.min(col).cast("string")
            mx = F.max(col).cast("string")
        else:  # arrays/structs/maps/binary: no portable rendering
            mn = F.lit(None).cast("string")
            mx = F.lit(None).cast("string")
        aggs.append(mn.alias(f"__p{i}__min"))
        aggs.append(mx.alias(f"__p{i}__max"))
        if _is_numeric(dt):
            avg = F.when(
                F.count(col) > 0,
                round6(
                    F.sum(col.cast("decimal(24,6)")).cast("double") / F.count(col)
                ),
            )
        else:
            avg = F.lit(None).cast("double")
        aggs.append(avg.alias(f"__p{i}__avg"))
        if isinstance(dt, T.StringType):
            alen = F.when(
                F.count(col) > 0,
                round6(
                    F.sum(F.length(col).cast("decimal(24,6)")).cast("double")
                    / F.count(col)
                ),
            )
        else:
            alen = F.lit(None).cast("double")
        aggs.append(alen.alias(f"__p{i}__len"))

    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.lit(fields[c].simpleString()).alias("dtype"),
            F.col("__n_rows").alias("n_rows"),
            (F.col("__n_rows") - F.col(f"__p{i}__nn")).alias("n_nulls"),
            F.col(f"__p{i}__nd").alias("n_distinct"),
            F.col(f"__p{i}__min").alias("min_value"),
            F.col(f"__p{i}__max").alias("max_value"),
            F.col(f"__p{i}__avg").alias("avg_value"),
            F.col(f"__p{i}__len").alias("avg_len"),
        )
        for i, c in enumerate(names)
    ]
    return row.select(F.inline(F.array(*structs)))


def numeric_histogram(
    df: DataFrame, col: str, lo: float, hi: float, bins: int
) -> DataFrame:
    """Fixed-grid histogram of a numeric column: ``(bucket, bucket_lo,
    bucket_hi, bucket_n)``, NULLs and NaNs dropped (a NaN has no bucket —
    without the explicit drop Spark's floor(NaN)→0 would silently count
    every NaN as a small value, exactly the corruption a profiler exists
    to surface; pair with ``column_stats`` null counts for the missing
    side), out-of-range values clamped into the edge buckets (so the
    bucket counts always sum to the non-null, non-NaN row count — a
    profile must not silently lose finite rows).

    Empty buckets are absent from the result (join a spine at the
    presentation edge if a dense grid is wanted). The bucket arithmetic is
    pure double ops — ``floor((x - lo) / width)`` — evaluated bit-identically
    by any IEEE-754 engine, so the relation is oracle-checkable.
    """
    if bins <= 0:
        raise ValueError(f"bins must be positive, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (float(hi) - float(lo)) / bins
    x = _ref(col).cast("double")
    b = F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(x.isNotNull() & ~F.isnan(x))
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .select(
            "bucket",
            (F.lit(float(lo)) + F.col("bucket") * F.lit(width)).alias("bucket_lo"),
            (F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(width)).alias(
                "bucket_hi"
            ),
            "bucket_n",
        )
    )


def top_values(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Top-k most frequent non-null values of a column as strings:
    ``(value, value_n, rank)``, ties broken by value ascending so the
    result is deterministic and oracle-checkable.

    The count relation is cut to k via ``orderBy().limit(k)`` —
    TakeOrderedAndProject, i.e. per-partition top-k + k-row driver merge,
    never a full sort. The rank window then runs over exactly k rows in one
    partition (the empty-frame warning Spark logs is about those k rows,
    not the data)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    counts = (
        df.filter(_ref(col).isNotNull())
        .groupBy(_ref(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("value_n"))
    )
    order = [F.desc("value_n"), F.asc("value")]
    top = counts.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
