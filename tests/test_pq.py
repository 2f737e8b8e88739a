"""Product quantization (operators/pq.py): encode correctness vs a numpy
reference, ADC scoring vs exact reconstruction scoring, training
determinism + error descent, and the map-side plan pins."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.operators.pq import (
    pq_encode,
    pq_quantization_error,
    pq_reconstruct,
    pq_topk,
    train_pq,
)

M, K, DIM = 4, 8, 64
DSUB = DIM // M


def _np_corpus(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, DIM)).astype(np.float32)


def _np_codebooks(seed: int = 11) -> list[list[list[float]]]:
    rng = np.random.default_rng(seed)
    return [
        [[float(x) for x in rng.normal(size=DSUB)] for _ in range(K)]
        for _ in range(M)
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    vecs = _np_corpus(120)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs


def test_pq_encode_matches_numpy_argmin(spark, corpus):
    df, vecs = corpus
    cbs = _np_codebooks()
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, cbs).collect()}
    cb = np.array(cbs)  # (M, K, DSUB)
    # float32 storage round-trips through Spark; mirror it
    x = vecs.astype(np.float32).astype(np.float64).reshape(len(vecs), M, DSUB)
    # argmin squared-L2 == argmax(dot - 0.5*cc); random gaussians put every
    # margin far above the 1e-6 snap, so exact equality is deterministic
    d2 = ((x[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    want = d2.argmin(axis=2)
    for i in range(len(vecs)):
        assert got[i] == list(want[i]), f"vec {i}: {got[i]} != {list(want[i])}"


def test_pq_reconstruct_concatenates_codebook_rows(spark, corpus):
    df, _ = corpus
    cbs = _np_codebooks()
    enc = pq_encode(df.limit(5), cbs)
    out = enc.select("vec_id", pq_reconstruct("codes", cbs).alias("r")).collect()
    for r in out:
        codes = enc.filter(F.col("vec_id") == r["vec_id"]).first()["codes"]
        want = [v for s in range(M) for v in cbs[s][codes[s]]]
        assert r["r"] == pytest.approx(want)


def test_pq_topk_equals_scoring_through_reconstruction(spark, corpus):
    """ADC cosine == cosine(q, x̂) within the round6 snap, and ranking uses
    the shared tie-break — cross-check against a numpy reconstruction."""
    df, vecs = corpus
    cbs = _np_codebooks()
    queries = df.filter(F.col("vec_id") < 3)
    got = pq_topk(pq_encode(df, cbs), queries, cbs, top_k=4).collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}

    cb = np.array(cbs)
    x = vecs.astype(np.float32).astype(np.float64).reshape(len(vecs), M, DSUB)
    d2 = ((x[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    codes = d2.argmin(axis=2)
    recon = np.stack([
        np.concatenate([cb[s, codes[i, s]] for s in range(M)])
        for i in range(len(vecs))
    ])
    q = vecs.astype(np.float32).astype(np.float64)
    for r in got:
        qi, ni = r["query_id"], r["neighbor_id"]
        want = float(q[qi] @ recon[ni] / (np.linalg.norm(q[qi]) * np.linalg.norm(recon[ni])))
        assert r["cosine"] == pytest.approx(want, abs=5e-6)
        assert ni != qi


def test_pq_encode_plan_is_map_only(spark, corpus):
    """The whole point at 100 TB: encoding is one linear scan — no
    exchange, no join, no Python in the plan."""
    df, _ = corpus
    plan = pq_encode(df, _np_codebooks())._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan


def test_pq_topk_plan_broadcasts_queries_only(spark, corpus):
    """Corpus codes never hash-shuffle for scoring; the only exchanges are
    the query-side broadcast and the per-query top-k window."""
    df, _ = corpus
    cbs = _np_codebooks()
    plan = (
        pq_topk(pq_encode(df, cbs), df.filter(F.col("vec_id") < 3), cbs, top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the rank window only


def test_train_pq_is_deterministic_and_descends(spark, corpus):
    df, _ = corpus
    cbs0 = train_pq(spark, df, m=M, k=K, n_iter=2)
    cbs1 = train_pq(spark, df.repartition(7), m=M, k=K, n_iter=2)
    assert cbs0 == cbs1, "training must not depend on partitioning"
    init = [
        [[float(x) for x in r["embedding"]][s * DSUB:(s + 1) * DSUB]
         for r in df.orderBy("vec_id").limit(K).collect()]
        for s in range(M)
    ]
    e_init = pq_quantization_error(df, init)
    e_trained = pq_quantization_error(df, cbs0)
    assert e_trained < e_init, (e_trained, e_init)


def test_train_pq_empty_cluster_keeps_previous_centroid(spark):
    # 8 identical vectors + k=2: one centroid wins everything, the other
    # must survive as its init value instead of vanishing.
    rows = [(i, [1.0] * DIM) for i in range(7)] + [(7, [0.0] * DIM)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cbs = train_pq(spark, df, m=M, k=2, n_iter=2)
    for s in range(M):
        assert len(cbs[s]) == 2
        assert all(len(cv) == DSUB for cv in cbs[s])


def test_ivf_pq_index_prunes_and_matches_full_probe(spark, tmp_path):
    """write_ivf_pq_index / ivf_pq_topk_from_index: the at-rest IVF-PQ —
    PartitionFilters prune to the probed cells, raw vectors never appear
    in the scan schema, and probing EVERY cell reproduces pq_topk over
    the full code relation exactly (same ADC Column by construction)."""
    import re

    from youtube_api_data_etl_automation_spark.operators.pq import (
        ivf_pq_topk_from_index,
        pq_encode,
        pq_topk,
        train_pq,
        write_ivf_pq_index,
    )
    from youtube_api_data_etl_automation_spark.sources.tables import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings", rebalance=True)
    cent = emb.filter(F.col("vec_id").between(10, 13)).select(
        (F.col("vec_id") - 10).alias("vec_id"), "embedding"
    )
    cbs = train_pq(spark, emb, m=4, k=4, n_iter=1)
    queries = emb.filter(F.col("vec_id") < 2)
    path = str(tmp_path / "ivfpq")
    write_ivf_pq_index(emb, cent, cbs, path)

    # full probe (nprobe = #cells) == flat pq_topk over all codes
    at_rest = ivf_pq_topk_from_index(
        spark, path, queries, cent, cbs, top_k=3, nprobe=4
    )
    flat = pq_topk(pq_encode(emb, cbs), queries, cbs, top_k=3)
    assert sorted(map(tuple, at_rest.collect())) == sorted(
        map(tuple, flat.collect())
    )

    # pruned probe: PartitionFilters carries cluster_id; codes-only scan
    pruned = ivf_pq_topk_from_index(
        spark, path, queries, cent, cbs, top_k=3, nprobe=1
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    m_ = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m_ and "cluster_id" in m_.group(1)
    scan = [ln for ln in plan.splitlines() if "Scan parquet" in ln and "codes" in ln]
    assert scan and all("embedding" not in ln for ln in scan)
    assert pruned.count() > 0
