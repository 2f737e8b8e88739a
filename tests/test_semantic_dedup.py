"""SemDeDup-shaped semantic dedup (operators/similarity.py::semantic_neardup):
planted-geometry correctness, min-id survivorship, partition invariance,
and the no-nested-loop plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.operators.similarity import (
    semantic_neardup,
)


def _corpus(spark):
    """Two clean directions plus planted near-duplicates of each; vectors
    are exact copies or tiny perturbations, so intra-group cosine ≈ 1 and
    cross-group cosine ≈ 0."""
    e1 = [1.0, 0.0, 0.0, 0.0]
    e1b = [0.999, 0.01, 0.0, 0.0]  # near-dup of e1
    e2 = [0.0, 1.0, 0.0, 0.0]
    e2b = [0.0, 0.999, 0.012, 0.0]  # near-dup of e2
    lone = [0.0, 0.0, 0.0, 1.0]  # no duplicate anywhere
    rows = [
        (1, e1), (2, e1), (3, e1b),       # group A: survivor should be 1
        (10, e2), (11, e2b),              # group B: survivor should be 10
        (20, lone),                        # singleton
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _centroids(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )


def test_min_id_survives_each_near_dup_group(spark):
    out = semantic_neardup(_corpus(spark), _centroids(spark), threshold=0.95)
    kept = {r.vec_id for r in out["survivors"].collect()}
    assert kept == {1, 10, 20}
    pairs = {(r.id_a, r.id_b) for r in out["dup_pairs"].collect()}
    # all intra-group pairs found, nothing across groups
    assert pairs == {(1, 2), (1, 3), (2, 3), (10, 11)}
    assert all(r.cosine >= 0.95 for r in out["dup_pairs"].collect())


def test_threshold_one_keeps_perturbed_vectors(spark):
    # at threshold above the perturbed cosine only EXACT copies collapse
    out = semantic_neardup(
        _corpus(spark), _centroids(spark), threshold=0.99999
    )
    kept = {r.vec_id for r in out["survivors"].collect()}
    assert kept == {1, 3, 10, 11, 20}  # only the exact copy (2) drops


def test_partition_invariance(spark):
    c = _corpus(spark)
    k1 = {
        r.vec_id
        for r in semantic_neardup(
            c.repartition(2), _centroids(spark), threshold=0.95
        )["survivors"].collect()
    }
    k2 = {
        r.vec_id
        for r in semantic_neardup(
            c.repartition(7), _centroids(spark), threshold=0.95
        )["survivors"].collect()
    }
    assert k1 == k2


def test_pair_generation_is_cluster_equijoin_not_nested_loop(spark):
    """The candidate join must be a hash equi-join on cluster_id; the only
    nested loop allowed in the plan is the sanctioned k-centroid broadcast
    inside assignment."""
    out = semantic_neardup(_corpus(spark), _centroids(spark), threshold=0.95)
    plan = out["dup_pairs"]._jdf.queryExecution().executedPlan().toString()
    # pair join on cluster_id is hash-based
    assert "BroadcastNestedLoopJoin" not in plan.replace(
        # strip the two sanctioned centroid-broadcast joins (one per side
        # of the pair self-join) before asserting
        "BroadcastNestedLoopJoin BuildRight, Inner", "", 2
    )


def test_real_embeddings_roundtrip(spark):
    """Over the testdata embeddings with sampled centroids (the IVF-style
    coarse quantizer): survivors ∪ dropped partitions the corpus."""
    from youtube_api_data_etl_automation_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = emb.filter(F.col("vec_id") % 29 == 1).limit(4)
    out = semantic_neardup(emb, cents, threshold=0.999)
    n = emb.count()
    n_surv = out["survivors"].count()
    n_drop = out["dup_pairs"].select("id_b").distinct().count()
    assert n_surv + n_drop == n
    assert n_surv > 0
