"""Scalar-transform surface (SURVEY.md §2.4 T1-T11) demonstrated on the
driver's synthetic tables, plus the flagship end-to-end pipeline shape.

Each query exercises the same Column-expression library the reference-shaped
``transforms.enrich_videos`` uses, so the oracle checks cover the library,
not ad-hoc copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import iso8601_duration_seconds, safe_ratio
from ..functions.rounding import round6, sql_round6
from ..sources.tables import load_table
from .registry import query


# T10 (÷0→NULL safe ratios) is driver-verified through the flagship query's
# unit_price column and unit-tested in tests/test_transforms.py.


@query(
    "iso_duration_seconds",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_orderkey % 97 = 0 THEN NULL
                ELSE CAST(l_linenumber * 3600
                          + (CAST(FLOOR(l_quantity) AS BIGINT) % 60) * 60
                          + (l_orderkey % 60) AS DOUBLE)
           END AS duration_sec
    FROM lineitem
    """,
)
def iso_duration_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: build ISO-8601 'PT#H#M#S' strings from lineitem columns, parse
    them with the engine's pure-Column duration parser, and check the result
    against direct arithmetic. Every 97th orderkey injects NULL (NULL-in →
    NULL-out policy, SURVEY.md §2.6 item 3).

    rebalance=True: 6 regex evaluations per row dominate — spread the scan
    across cores instead of serializing on the single-row-group file."""
    li = load_table(spark, sf_dir, "lineitem", rebalance=True)
    h = F.col("l_linenumber").cast("long")
    m = F.floor(F.col("l_quantity")).cast("long") % 60
    s = F.col("l_orderkey") % 60
    iso = F.when(
        F.col("l_orderkey") % 97 == 0, F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            F.lit("PT"),
            h.cast("string"), F.lit("H"),
            m.cast("string"), F.lit("M"),
            s.cast("string"), F.lit("S"),
        )
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        iso8601_duration_seconds(iso).alias("duration_sec"),
    )


# T5-T8 (year / time-of-day / English day-name extraction, UTC session) are
# driver-verified inside `json_props_extract` (plans/advanced.py), which
# projects them from the event timestamp alongside the JSON extraction —
# the same publish_year/publish_time/published_dayofweek derivation as the
# reference (fetch_youtube_data.py:176-180).
# T1/T2 + P2 (null-tolerant nested projection, fillna(0)+cast) are
# driver-verified through `json_props_extract` (plans/advanced.py), which
# runs the same .get() → fillna → astype chain over the events JSON.


@query("reference_etl_video_stats", oracle=None)
def reference_etl_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ENTIRE daily ETL (fetch_youtube_data.py:143-200) run
    end-to-end over the custom API-shaped DataSource: channel extract →
    partition-per-playlist scan → anti-join delta → 11→19-column enrich →
    idempotent append → dimension overwrite; returns the loaded video_stats
    table. Rows-only driver check (external-API source — the fake transport
    is deterministic but not SQL-reproducible); the transform block itself
    is value-checked by the golden tests and the T-queries' oracles.

    The ``tags`` array is projected to its JSON text at the query edge: the
    driver's canonicalizer hashes scalar cells (pandas factorize chokes on
    lists), and to_json is a lossless, deterministic rendering. The stored
    table — and ``enrich_videos`` — keep the real ArrayType column."""
    import tempfile

    from ..pipeline import run_etl

    warehouse = tempfile.mkdtemp(prefix="ref_etl_wh_")
    run_etl(spark, [f"chan{i}" for i in range(13)], warehouse)
    loaded = spark.read.parquet(f"{warehouse}/video_stats")
    return loaded.withColumn("tags", F.to_json("tags"))


@query(
    "flagship_new_order_enrichment",
    oracle=f"""
    WITH delta AS (
      SELECT * FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0)
    ),
    enriched AS (
      SELECT d.o_orderkey, d.o_orderpriority,
             CAST(year(d.o_orderdate) AS INT) AS order_year,
             dayname(d.o_orderdate) AS order_dow,
             l.l_quantity,
             l.l_extendedprice,
             {sql_round6('l.l_extendedprice / NULLIF(l.l_quantity, 0)')} AS unit_price
      FROM delta d JOIN lineitem l ON l.l_orderkey = d.o_orderkey
    )
    SELECT o_orderpriority, order_year,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           {sql_round6('CAST(SUM(CAST(unit_price AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)')} AS avg_unit_price
    FROM enriched
    GROUP BY o_orderpriority, order_year
    """,
)
def flagship_new_order_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pipeline shape (SURVEY.md §7.2): anti-join delta detection
    (J1) → scalar enrichment (T5/T8/T10) → join to the fact table → grouped
    aggregation. This is the reference's whole computational core as ONE lazy
    Catalyst plan — the broadcast anti-join and broadcast dims mean the only
    shuffle is the final aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    # rebalance: two broadcast probes + decimal aggregation per fact row is
    # enough per-row work to beat the narrow-column shuffle (A/B: 1.66s →
    # 1.22s on the single-row-group test file; no-op on real layouts).
    li = load_table(spark, sf_dir, "lineitem", rebalance=True)
    existing = orders.filter(F.col("o_orderkey") % 5 == 0).select("o_orderkey")
    delta = orders.join(F.broadcast(existing), "o_orderkey", "left_anti")
    # Broadcast the enriched delta: it's delta-sized (small by the
    # incremental invariant) while lineitem is the 100 TB fact — this keeps
    # the fact side from ever shuffling; the only exchange left in the whole
    # plan is the final aggregation.
    enriched = (
        F.broadcast(
            delta.select(
                "o_orderkey",
                "o_orderpriority",
                F.year("o_orderdate").alias("order_year"),
                F.date_format("o_orderdate", "EEEE").alias("order_dow"),
            )
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderpriority",
            "order_year",
            "l_quantity",
            "l_extendedprice",
            round6(safe_ratio("l_extendedprice", "l_quantity")).alias("unit_price"),
        )
    )
    return enriched.groupBy("o_orderpriority", "order_year").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        round6(
            F.sum(F.col("unit_price").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))
        ).alias("avg_unit_price"),
    )
