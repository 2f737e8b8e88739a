"""Grouping-sets-family APIs value-checked against their SQL equivalents.

The registered driver query for this family is the full-lattice CUBE with
grouping_id (the cube section of `olap_status_priority`); ROLLUP and arbitrary groupingSets use
the same map-side set expansion, pinned here so the consolidated registry
doesn't lose their coverage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.sources.tables import load_table

from .conftest import SF_DIR


def _rows(df):
    # repr-keyed sort: subtotal rows contain NULLs, and None doesn't order
    # against strings.
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_rollup_matches_sql(spark):
    orders = load_table(spark, SF_DIR, "orders")
    api = orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    orders.createOrReplaceTempView("t_orders_rollup")
    sql = spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        FROM t_orders_rollup GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """
    )
    assert _rows(api) == _rows(sql)
    # ROLLUP of 2 cols = 3 grouping sets; strictly fewer rows than CUBE's 4.
    cube_n = orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1))
    ).count()
    assert api.count() < cube_n


def test_grouping_sets_matches_sql_with_grouping_id(spark):
    """Arbitrary GROUPING SETS ((a), (b), ()) — not derivable from rollup or
    cube — with grouping_id() disambiguating subtotal rows from real NULL
    groups (Spark's bit-per-column id == SQL GROUPING())."""
    orders = load_table(spark, SF_DIR, "orders")
    api = orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    orders.createOrReplaceTempView("t_orders_gs")
    sql = spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS LONG) AS gid,
               COUNT(*) AS n_orders
        FROM t_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
    assert _rows(api) == _rows(sql)
