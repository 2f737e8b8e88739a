"""Lloyd's k-means over an embedding column — the iterative-refinement op
(IVF index training; corpus organization for curriculum/dedup sharding).

Spark shape per iteration: map-side assignment (centroids broadcast — the
corpus NEVER shuffles for assignment) + one shuffle of (cluster, component)
partial sums for the recompute. Driver holds only k×dim centroid floats.
At 100 TB: assignment cost is linear and embarrassingly parallel; the
recompute shuffle carries k·dim·partitions rows — negligible. Lineage is
truncated per round via localCheckpoint-free re-planning from literals
(centroids re-enter as a literal DataFrame each round, so the plan depth
stays constant across iterations).

Sums accumulate in DECIMAL so centroid updates are bit-deterministic
across partitionings/runs (double addition is not associative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round6
from ..functions.vectors import cosine_similarity


def _assign(corpus: DataFrame, cent_df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment by cosine (deterministic tie-break).
    max_by aggregate, not a window: the k scored rows per vector collapse
    map-side, so the exchange carries |corpus| rows, unsorted — see
    similarity.assign_clusters for the full argument."""
    scored = corpus.join(F.broadcast(cent_df)).select(
        F.col(id_col),
        F.col(vec_col),
        "cluster_id",
        round6(cosine_similarity(vec_col, "cv")).alias("_csim"),
    )
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct(F.col(vec_col), F.col("cluster_id")),
            F.struct(F.col("_csim"), (-F.col("cluster_id")).alias("_tie")),
        ).alias("_best")
    )
    return best.select(
        id_col,
        F.col(f"_best.{vec_col}").alias(vec_col),
        F.col("_best.cluster_id").alias("cluster_id"),
    )


def kmeans_lloyd(spark: SparkSession, corpus: DataFrame, init_centroids: DataFrame,
                 n_iter: int = 3, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 return_centroids: bool = False):
    """Fixed-iteration Lloyd's k-means. ``init_centroids``: (cluster_id, cv).
    Returns the final per-cluster stats (cluster_id, n_vecs,
    avg_cos_to_centroid) — deterministic given the init (decimal-exact
    accumulation). With ``return_centroids=True`` returns
    ``(stats, centroids_df)`` so the TRAINED centroids can feed
    assign_clusters / ivf_topk / semantic_neardup (r6: they were computed
    and then dropped, forcing callers onto the unrefined init).

    A cluster that wins zero vectors in an iteration KEEPS its previous
    centroid instead of silently vanishing (k used to shrink with no
    signal); it simply reports n_vecs=0-absent in the stats, like any
    empty group."""
    cent_df = init_centroids.select("cluster_id", F.col("cv").cast("array<double>"))
    dim = len(cent_df.first()["cv"])
    prev = {
        int(r["cluster_id"]): [float(x) for x in r["cv"]]
        for r in cent_df.collect()
    }
    for _ in range(n_iter):
        assigned = _assign(corpus, cent_df, id_col, vec_col)
        # Recompute: element-wise decimal mean per cluster.
        comp = assigned.select(
            "cluster_id", F.posexplode(F.col(vec_col).cast("array<double>"))
        )
        means = (
            comp.groupBy("cluster_id", "pos")
            .agg(
                # Exact decimal SUM (order-independent), cast to double
                # BEFORE the divide: one double division is reproducible
                # across engines, while decimal-division precision/scale
                # rules are engine-specific (Spark and DuckDB disagree).
                (
                    F.sum(F.col("col").cast("decimal(28,12)")).cast("double")
                    / F.count(F.lit(1))
                )
                .alias("m")
            )
            .groupBy("cluster_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select(
                "cluster_id",
                F.transform(F.col("pm"), lambda s: s["m"]).alias("cv"),
            )
        )
        # Centroids re-enter as literal rows: constant plan depth per round.
        rows = means.collect()
        if not rows:
            break
        new = {int(r["cluster_id"]): [float(x) for x in r["cv"]] for r in rows}
        assert all(len(cv) == dim for cv in new.values())
        # Empty clusters keep their previous centroid (winning no vectors
        # must not silently shrink k).
        prev = {cid: new.get(cid, cv) for cid, cv in prev.items()}
        cent_df = spark.createDataFrame(
            sorted(prev.items()), "cluster_id int, cv array<double>"
        )
    final = _assign(corpus, cent_df, id_col, vec_col)
    stats = (
        final.join(F.broadcast(cent_df), "cluster_id")
        .select(
            "cluster_id",
            round6(cosine_similarity(vec_col, "cv")).alias("c"),
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            round6(
                F.sum(F.col("c").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_cos_to_centroid"),
        )
    )
    return (stats, cent_df) if return_centroids else stats
