"""Extended north-star queries: multimodal binary processing (mapInPandas),
SimHash dedup, and the Structured Streaming ingestion mode.

The multimodal oracles work because the payloads here are utf-8 text bytes
(ASCII corpus): octet_length/ascii reproduce the Python-side byte math
exactly, which validates the Arrow/mapInPandas plumbing itself.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round6
from ..functions.text import EN_STOPWORDS
from ..operators.multimodal import attach_binary, frame_features
from ..operators.simhash import N_BITS, simhash_pairs
from ..sources.tables import load_table
from .registry import query
from .text_queries import _NORM, _sql_list

_QUALITY_STOPWORDS = _sql_list(EN_STOPWORDS)


@query(
    "multimodal_frame_features",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           CAST(least(16, n - i * 16) AS INT) AS frame_len,
           CAST(ascii(substr(text, CAST(i * 16 + 1 AS INT), 1)) AS INT) AS first_byte,
           CAST(ascii(substr(text, CAST(i * 16 + least(16, n - i * 16) AS INT), 1)) AS INT) AS last_byte
    FROM b, unnest(generate_series(0, CAST(ceil(n / 16.0) AS BIGINT) - 1)) AS t(i)
    """,
)
def multimodal_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal pipeline shape end-to-end: binary payload + metadata
    modeling → fixed-stride frame sampling (video/audio chunk access
    pattern) → per-frame feature extraction, fused in one Arrow-batched
    mapInPandas pass (fan-out stays in-partition, payload scanned once;
    decode itself stubbed per environment, plumbing fully real). The
    ASCII corpus makes byte features oracle-checkable via substr/ascii."""
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    return frame_features(attach_binary(docs), frame_bytes=16)


def _simhash_oracle_core() -> str:
    hexpos = "strpos('0123456789abcdef', substr(hx, {j}, 1)) - 1"
    bit_sums = ",\n             ".join(
        f"SUM((({hexpos.format(j=j + 1)}) % 2) * 2 - 1) AS b{j}" for j in range(N_BITS)
    )
    sig = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(N_BITS))
    return f"""
    WITH n AS (
      SELECT doc_id, {_NORM.format(col='text')} AS norm FROM documents
    ), toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS tok
      FROM n WHERE norm <> ''
    ), h AS (
      SELECT doc_id, md5(tok) AS hx FROM toks
    ), sums AS (
      SELECT doc_id,
             {bit_sums}
      FROM h GROUP BY doc_id
    ), sig AS (
      SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM sums
    )
    """


# The per-doc SimHash signature is driver-verified through
# `dedup_simhash_pairs` / `dedup_connected_components` (both recompute the
# identical signature in their oracles) and property-tested in
# tests/test_operators.py.


@query(
    "dedup_simhash_pairs",
    oracle=_simhash_oracle_core()
    + """
    , halves AS (
      SELECT doc_id, simhash, simhash % 256 AS lo,
             CAST(floor(simhash / 256) AS BIGINT) AS hi
      FROM sig WHERE doc_id % 7 = 0
    ), cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM halves a JOIN halves b ON a.lo = b.lo AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id, b.doc_id,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT)
      FROM halves a JOIN halves b ON a.hi = b.hi AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 4
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming-LSH banding on signature halves
    (union of equi-joins — never a cross join), exact bit_count rescore."""
    docs = load_table(spark, sf_dir, "documents", rebalance=True).filter(F.col("doc_id") % 7 == 0)
    pairs = simhash_pairs(docs, max_hamming=4)
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


@query(
    "dedup_connected_components",
    oracle=_simhash_oracle_core().replace("WITH n AS", "WITH RECURSIVE n AS", 1)
    + """
    , halves AS (
      SELECT doc_id, simhash, simhash % 256 AS lo,
             CAST(floor(simhash / 256) AS BIGINT) AS hi
      FROM sig WHERE doc_id % 7 = 0
    ), cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM halves a JOIN halves b ON a.lo = b.lo AND a.doc_id < b.doc_id
        AND bit_count(xor(a.simhash, b.simhash)) <= 4
      UNION
      SELECT a.doc_id, b.doc_id
      FROM halves a JOIN halves b ON a.hi = b.hi AND a.doc_id < b.doc_id
        AND bit_count(xor(a.simhash, b.simhash)) <= 4
    ), bidir AS (
      SELECT doc_a AS a, doc_b AS b FROM cand
      UNION
      SELECT doc_b, doc_a FROM cand
    ), reach(node, label) AS (
      SELECT a, a FROM bidir
      UNION
      SELECT e.b, r.label FROM reach r JOIN bidir e ON r.node = e.a
    )
    SELECT node AS doc_id, MIN(label) AS canonical_id FROM reach GROUP BY node
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assembly: SimHash near-dup pairs → connected
    components by iterative min-label propagation (the iterative-algorithm
    shape: per-round join+aggregate, driver-side O(1) convergence probe).
    Oracle = DuckDB recursive CTE over the identical pair graph."""
    from ..operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents", rebalance=True).filter(
        F.col("doc_id") % 7 == 0
    )
    pairs = simhash_pairs(docs, max_hamming=4)
    return connected_components(pairs)


_CC_CTES_H = """
    , halves AS (
      SELECT doc_id, simhash, simhash % 256 AS lo,
             CAST(floor(simhash / 256) AS BIGINT) AS hi
      FROM sig WHERE doc_id % 7 = 0
    ), cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM halves a JOIN halves b ON a.lo = b.lo AND a.doc_id < b.doc_id
        AND bit_count(xor(a.simhash, b.simhash)) <= {h}
      UNION
      SELECT a.doc_id, b.doc_id
      FROM halves a JOIN halves b ON a.hi = b.hi AND a.doc_id < b.doc_id
        AND bit_count(xor(a.simhash, b.simhash)) <= {h}
    ), bidir AS (
      SELECT doc_a AS a, doc_b AS b FROM cand
      UNION
      SELECT doc_b, doc_a FROM cand
    ), reach(node, label) AS (
      SELECT a, a FROM bidir
      UNION
      SELECT e.b, r.label FROM reach r JOIN bidir e ON r.node = e.a
    ), cc AS (
      SELECT node AS doc_id, MIN(label) AS canonical_id FROM reach GROUP BY node
    )
"""


@query(
    "dedup_survivors",
    oracle=_simhash_oracle_core().replace("WITH n AS", "WITH RECURSIVE n AS", 1)
    + _CC_CTES_H.format(h=1)
    + """
    , qn AS (
      SELECT doc_id, text, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS qnorm
      FROM documents WHERE doc_id % 7 = 0
    ), qs AS (
      SELECT doc_id,
             CAST(CASE WHEN qnorm = '' THEN 0 ELSE len(string_split(qnorm, ' ')) END AS DOUBLE) AS nt,
             CAST(COALESCE(length(text), 0) AS DOUBLE) AS ln,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) AS np,
             CAST(len(list_filter(string_split(qnorm, ' '),
                                  x -> list_contains(""" + _QUALITY_STOPWORDS + """, x))) AS DOUBLE) AS sw
      FROM qn
    ), quality AS (
      SELECT doc_id,
             floor((0.5 * least(1.0, nt / 64.0)
                   + 0.3 * (1.0 - CASE WHEN ln > 0 THEN np / ln ELSE 0.0 END)
                   + 0.2 * CASE WHEN nt > 0 THEN sw / nt ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS q
      FROM qs
    ), ranked AS (
      SELECT cc.canonical_id, cc.doc_id, quality.q,
             COUNT(*) OVER (PARTITION BY cc.canonical_id) AS n_members,
             ROW_NUMBER() OVER (PARTITION BY cc.canonical_id
                                ORDER BY quality.q DESC, cc.doc_id) AS rn
      FROM cc JOIN quality USING (doc_id)
    )
    SELECT canonical_id, doc_id AS survivor_id,
           CAST(n_members AS BIGINT) AS n_members, q AS survivor_quality
    FROM ranked WHERE rn = 1
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame: near-dup pairs → duplicate clusters (CC) → keep
    the highest-quality member per cluster. Composes SimHash LSH, iterative
    connected components, and the quality heuristic into the op a training-
    data pipeline actually runs: 'which copy survives'. Survivor selection
    is ONE aggregation (count + min_by argmax with the (-q, doc_id)
    ordering struct == q DESC, doc_id ASC) instead of two windows — partial
    aggregation, no per-cluster sort."""
    from ..functions.text import quality_score
    from ..operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents", rebalance=True).filter(
        F.col("doc_id") % 7 == 0
    )
    pairs = simhash_pairs(docs, max_hamming=1)
    cc = connected_components(pairs)
    quality = docs.select("doc_id", round6(quality_score("text")).alias("q"))
    j = cc.join(quality, "doc_id")
    best = j.groupBy("canonical_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min_by(
            F.struct("doc_id", "q"),
            F.struct((-F.col("q")).alias("_nq"), F.col("doc_id")),
        ).alias("_b"),
    )
    return best.select(
        "canonical_id",
        F.col("_b.doc_id").alias("survivor_id"),
        "n_members",
        F.col("_b.q").alias("survivor_quality"),
    )


@query(
    "streaming_tumbling_counts",
    oracle="""
    SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming mode: availableNow drain of the events table
    through a watermarked tumbling-window aggregation into a memory sink —
    same results as the batch GROUP BY (checked by the oracle), but computed
    by the streaming engine with bounded state."""
    import tempfile

    from ..streaming.ingest import read_events_stream, run_available_now, tumbling_event_counts

    name = f"stream_counts_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, sf_dir)
    agg = tumbling_event_counts(stream, window="1 hour", watermark="2 hours")
    run_available_now(agg, tempfile.mkdtemp(prefix="ckpt_"), name)
    return spark.table(name)
