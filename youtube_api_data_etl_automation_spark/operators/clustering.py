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


def cluster_occupancy(corpus: DataFrame, centroids: DataFrame,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Cluster-occupancy histogram of an embedding relation: assign every
    vector to its nearest centroid (broadcast argmax — the corpus never
    shuffles its vectors; the one exchange carries (id, cluster) pairs)
    and count per cluster. ``(cluster_id, n)`` — at most k rows.

    This is the semantic analogue of ``profile.numeric_histogram``: the
    centroids are the fixed grid, occupancy is the bucket mass. Built for
    :func:`embedding_drift`, useful alone as a corpus-composition readout
    (which semantic regions a crawl actually filled).

    Unlike :func:`_assign` (whose callers need the vectors back), the
    max_by here carries ONLY the winning cluster_id, so the post-scoring
    exchange holds (id, cluster) partials — the embedding column dies at
    the map side [pinned in tests/test_profile.py]."""
    scored = corpus.select(id_col, vec_col).join(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col("cluster_id"),
        round6(cosine_similarity(vec_col, "cv")).alias("_csim"),
    )
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.col("cluster_id"),
            F.struct(F.col("_csim"), (-F.col("cluster_id")).alias("_tie")),
        ).alias("cluster_id")
    )
    return best.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def embedding_drift(cur: DataFrame, prev: DataFrame, centroids: DataFrame,
                    *, id_col: str = "vec_id", vec_col: str = "embedding",
                    psi_threshold: float = 0.2,
                    epsilon: float = 1e-6) -> DataFrame:
    """SEMANTIC drift between two embedding batches: PSI over their
    cluster-occupancy distributions under a SHARED, fixed centroid set —
    the embedding-space twin of ``profile.histogram_drift``. A numeric
    histogram can't see a corpus pivoting from code to marketing prose
    when every scalar stat stays flat; occupancy over semantic regions
    can. One row: ``(psi, n_buckets, prev_total, cur_total, flagged)``
    (``n_buckets`` = clusters occupied by either side).

    The centroids MUST be the same fixed relation on both sides (train
    once — e.g. ``kmeans_lloyd(return_centroids=True)`` on the baseline
    corpus — then reuse; re-training per batch would move the grid under
    the metric, exactly the mismatch histogram_drift raises on for
    numeric grids). Cost: one broadcast-assign aggregate per side over
    the batch being compared — the baseline side's occupancy can be a
    ≤k-row committed relation reused forever, so steady-state monitoring
    prices at one pass over each NEW batch only, like the streaming PSI
    monitor it composes with."""
    from .profile import histogram_drift

    def occ_hist(df: DataFrame) -> DataFrame:
        # cluster ids as the "grid": lo/hi = [id, id+1) so the shared-grid
        # guard inside histogram_drift is trivially satisfied when both
        # sides use the same centroid relation
        return cluster_occupancy(df, centroids, id_col, vec_col).select(
            F.col("cluster_id").cast("int").alias("bucket"),
            F.col("cluster_id").cast("double").alias("bucket_lo"),
            (F.col("cluster_id") + 1).cast("double").alias("bucket_hi"),
            F.col("n").alias("bucket_n"),
        )

    return histogram_drift(
        occ_hist(cur), occ_hist(prev),
        psi_threshold=psi_threshold, epsilon=epsilon,
    )
