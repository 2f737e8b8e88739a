"""Similarity-search queries over the ``embeddings`` table (north-star ops).

Oracle note: DuckDB's list_cosine_similarity on FLOAT[] accumulates in
float32 and its internal formula differs from ours, so the oracles cast to
DOUBLE[] and spell out the exact same formula the engine uses
(dot / (||a||·||b||)) — double-for-double identical op sequence, rounded at
the query edge on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round6
from ..operators.similarity import brute_force_topk, most_similar_pairs, sign_lsh_topk
from ..sources.tables import load_table
from .registry import query


def _cos(a: str, b: str) -> str:
    """DuckDB mirror of functions.vectors.cosine_similarity."""
    ad, bd = f"CAST({a} AS DOUBLE[])", f"CAST({b} AS DOUBLE[])"
    return (
        f"list_dot_product({ad}, {bd})"
        f" / nullif(sqrt(list_dot_product({ad}, {ad}))"
        f" * sqrt(list_dot_product({bd}, {bd})), 0.0)"
    )


# The single-query brute-force cosine top-k is the batch=1 special case of
# `embedding_knn_batch` (same broadcast-queries × corpus plan, same exact
# scoring); only the batched form is registered.


@query(
    "embedding_knn_batch",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, {_cos('e.embedding', 'q.qv')} AS cos
      FROM embeddings e JOIN q ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY floor(cos * 1000000.0 + 0.5) / 1000000.0 DESC, neighbor_id) AS INT) AS rank,
             floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 3
    """,
)
def embedding_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact kNN: broadcast query set × corpus, windowed rank."""
    emb = load_table(spark, sf_dir, "embeddings", rebalance=True)
    queries = emb.filter(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, top_k=3)


@query(
    "ann_sign_lsh_topk",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding,
             (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM bucketed WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, {_cos('e.embedding', 'q.qv')} AS cos
      FROM bucketed e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY floor(cos * 1000000.0 + 0.5) / 1000000.0 DESC, neighbor_id) AS INT) AS rank,
             floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 3
    """,
)
def ann_sign_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates come from an equi-join on
    the sign-pattern bucket (expected 1/2^bits of the corpus per query) —
    the scale path for ANN. Deterministic hyperplanes keep it oracle-checkable."""
    emb = load_table(spark, sf_dir, "embeddings", rebalance=True)
    queries = emb.filter(F.col("vec_id") < 5)
    return sign_lsh_topk(emb, queries, top_k=3, bits=4)


@query(
    "embedding_neardup_pairs",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding,
             (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos('a.embedding', 'b.embedding')} AS cos
      FROM s a JOIN s b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
    FROM pairs
    ORDER BY floor(cos * 1000000.0 + 0.5) / 1000000.0 DESC, id_a, id_b
    LIMIT 5
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: most-similar pairs within
    a deterministic sample, candidates from the sign-LSH bucket equi-join
    (sub-quadratic; near-identical vectors share every hyperplane sign, so
    the pairs that matter survive the bucketing)."""
    return most_similar_pairs(load_table(spark, sf_dir, "embeddings", rebalance=True), top_n=5, sample_mod=10)


@query(
    "embedding_norm_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           floor((CAST(SUM(CAST(nrm AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_norm
    FROM n
    GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm stats — JVM-side higher-order aggregate over
    the array column; decimal-exact mean keeps it order-independent."""
    from ..functions.vectors import l2_norm

    emb = load_table(spark, sf_dir, "embeddings", rebalance=True)
    return (
        emb.select("label", l2_norm("embedding").alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            round6(
                F.sum(F.col("nrm").cast("decimal(18,12)")).cast("double") / F.count(F.lit(1))
            ).alias("avg_norm"),
        )
    )
