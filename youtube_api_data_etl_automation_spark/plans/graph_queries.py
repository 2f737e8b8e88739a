"""Graph queries: PageRank over the part co-purchase graph.

The corpus-pipeline use of PageRank is source/document quality weighting
(upweight well-connected nodes); here the demonstration graph is derived
from the TPC-H-ish fixture itself — parts that appear on CONSECUTIVE
lineitems of the same order get a directed edge (the "bought together"
item-graph shape) — so the query is deterministic and self-contained.

The oracle unrolls the power iteration as one CTE block per round (the
kmeans_embeddings precedent, plans/advanced.py): because the engine-side
operator runs in fixed-point integer arithmetic
(operators/graphrank.py::pagerank_fixedpoint), every CTE is exact bigint
math — no float/decimal division semantics to reconcile between engines,
and the comparison is on exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graphrank import pagerank_fixedpoint
from ..sources.tables import load_table
from .registry import query

_ITERATIONS = 5
_SCALE = 10**12
_D_NUM, _D_DEN = 85, 100


def _pagerank_oracle() -> str:
    head = f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
      WHERE a.l_partkey <> b.l_partkey
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
    links AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d ON e.src = d.src),
    params AS (
      SELECT ({_D_DEN - _D_NUM} * {_SCALE}) // ({_D_DEN} * n) AS base, n FROM nn
    ),
    r0 AS (SELECT node, {_SCALE} // (SELECT n FROM nn) AS r FROM nodes)"""
    rounds = []
    for i in range(_ITERATIONS):
        rounds.append(f"""
    d{i} AS (
      SELECT COALESCE(SUM(r.r), 0) AS dm
      FROM r{i} r LEFT JOIN deg ON r.node = deg.src
      WHERE deg.src IS NULL
    ),
    c{i} AS (
      SELECT l.dst, SUM(r.r // l.deg) AS m
      FROM links l JOIN r{i} r ON l.src = r.node
      GROUP BY l.dst
    ),
    r{i + 1} AS (
      SELECT n.node,
             (SELECT base FROM params)
             + ({_D_NUM} * (COALESCE(c.m, 0)
                            + (SELECT dm // params.n FROM d{i}, params))) // {_D_DEN} AS r
      FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst
    )""")
    tail = f"""
    SELECT node AS part_id, CAST(r AS BIGINT) AS rank_fp,
           floor((r / {_SCALE}.0) * 1000000000.0 + 0.5) / 1000000000.0 AS rank
    FROM r{_ITERATIONS}
    """
    return head + "," + ",".join(rounds) + tail


@query("pagerank_copurchase", oracle=_pagerank_oracle())
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {n} fixed rounds) over the part co-purchase
    graph, in bit-deterministic fixed-point arithmetic.

    Edge derivation is one self-equi-join of lineitem on
    (orderkey, linenumber+1) — shuffle on the order key, never a cross
    join. The iteration itself is the engine's standard iterative shape
    (per-round join + aggregate on a reused partitioning, lazy
    localCheckpoint, O(1) driver scalars); because ranks are bigint
    pico-units, the oracle mirrors every round exactly — the driver
    comparison is on exact integers, not rounded floats."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    nxt = li.select(
        "l_orderkey",
        (F.col("l_linenumber") - 1).alias("l_linenumber"),
        F.col("l_partkey").alias("dst_part"),
    )
    edges = (
        li.join(nxt, ["l_orderkey", "l_linenumber"])
        .filter(F.col("l_partkey") != F.col("dst_part"))
        .select(F.col("l_partkey").alias("src"), F.col("dst_part").alias("dst"))
    )
    ranks = pagerank_fixedpoint(
        edges,
        iterations=_ITERATIONS,
        damping_num=_D_NUM,
        damping_den=_D_DEN,
        scale=_SCALE,
    )
    # Same pure-double rounding formula as the oracle (functions/rounding.py
    # on why Spark's ROUND can't be mirrored at .5-boundary doubles).
    r = F.col("rank_fp") / F.lit(float(_SCALE))
    return ranks.select(
        F.col("node").alias("part_id"),
        F.col("rank_fp"),
        (F.floor(r * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)).alias("rank"),
    )


pagerank_copurchase.__doc__ = pagerank_copurchase.__doc__.format(n=_ITERATIONS)
