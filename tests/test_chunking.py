"""chunk_documents: Python-reference differential on real docs, coverage/
overlap invariants, and edge shapes."""

from __future__ import annotations

import pytest

from youtube_api_data_etl_automation_spark.operators.chunking import chunk_documents
from youtube_api_data_etl_automation_spark.sources.tables import load_table

from .conftest import SF_DIR


def py_chunks(toks, chunk, overlap):
    if not toks:
        return []
    stride = chunk - overlap
    out, i, idx = [], 0, 0
    while True:
        window = toks[i : i + chunk]
        out.append((idx, i + 1, len(window), " ".join(window)))
        if i + chunk >= len(toks):
            break
        i += stride
        idx += 1
    return out


def test_differential_vs_python_on_documents(spark):
    import re

    docs = load_table(spark, SF_DIR, "documents")
    got = {}
    for r in chunk_documents(docs, chunk_tokens=16, overlap=4).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_token, r.n_tokens, r.chunk)
        )
    raw = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for doc_id, text in raw.items():
        toks = [t for t in re.sub(r"\s+", " ", text.strip().lower()).split(" ") if t != ""]
        exp = py_chunks(toks, 16, 4)
        assert sorted(got.get(doc_id, [])) == sorted(exp), doc_id


def test_coverage_and_overlap_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rows = chunk_documents(docs, chunk_tokens=32, overlap=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda r: r.chunk_idx)
        # contiguous indices from 0
        assert [c.chunk_idx for c in cs] == list(range(len(cs)))
        for a, b in zip(cs, cs[1:]):
            assert b.start_token - a.start_token == 32 - 8  # stride
            assert a.n_tokens == 32                          # only last may be short
        # full coverage: last chunk reaches the final token
        last = cs[-1]
        total = max(c.start_token + c.n_tokens - 1 for c in cs)
        assert last.start_token + last.n_tokens - 1 == total


def test_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "")], "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_id, r.chunk_idx, r.start_token, r.n_tokens, r.chunk) == (
        1, 0, 1, 3, "a b c"
    )


def test_bad_params_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)
