"""PageRank over a document-similarity/link graph — iterative quality
weighting (the harmonic-centrality-style signal corpus pipelines use to
upweight well-connected sources).

Third member of the engine's iterative family, same Spark discipline as
connected components (operators/dedup.py) and k-means
(operators/clustering.py):

- per-round work is ONE equi-join (ranks ⋈ out-degree edges) plus ONE
  key-aggregate, both shuffling on the node id so the partitioning is
  reused round to round;
- lineage truncated per round with a lazy localCheckpoint — the round's
  single action materializes it (one job/round, bounded plan depth);
- dangling mass (nodes with no out-edges) is redistributed uniformly via
  a one-number aggregate, not a join;
- the driver holds only O(1) scalars (round index, dangling mass).

Fixed iteration count keeps runs engine-portable and deterministic
(sums accumulate in decimal) — convergence-threshold stopping would put
a float comparison on the control path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,18)"


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Ranks over a directed graph; returns (node, rank), Σrank = 1.

    ``edges``: one row per directed edge. Nodes appearing only as
    destinations still receive rank (they contribute dangling mass)."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg) — the static per-round join input, materialized once.
    links = e.join(out_deg, "src").localCheckpoint()

    ranks = nodes.select(
        "node", (F.lit(1.0) / F.lit(float(n_nodes))).cast(_DEC).alias("rank")
    ).localCheckpoint()
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        # Dangling mass: rank sitting on nodes with no out-edges, spread
        # uniformly this round (one scalar to the driver, no extra join).
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.sum("rank"))
            .first()[0]
        )
        dangling_share = float(dangling or 0.0) / n_nodes
        contribs = (
            links.join(ranks, links.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("deg")).cast(_DEC).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0).cast(_DEC))
                        + F.lit(dangling_share)
                    )
                ).cast(_DEC).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("rank").cast("double").alias("rank"))
