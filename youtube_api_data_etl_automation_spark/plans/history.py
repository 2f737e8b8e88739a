"""Round-4 operator queries: repeated-substring spans, SCD2 dimension
history, and per-group (domain) capping.

Each query is the oracle-checked demonstration of an operator module:
operators/substring.py, operators/scd.py, operators/capping.py. The
reference anchor is the dimension-overwrite sink (fetch_youtube_data.py:198
— history-destroying; SCD2 is the upgrade) and the corpus-curation north
star (repeated-text removal and domain caps are standard LLM-corpus steps
the reference's capture ETL feeds into).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.capping import cap_per_group
from ..operators.scd import scd2_history
from ..operators.substring import repeated_span_profile
from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Repeated-substring spans (documents) — exact-substring dedup family
# ---------------------------------------------------------------------------

_SPAN_K = 8  # minimum repeated-substring length, in tokens

_SPANS_ORACLE = f"""
WITH n AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
  FROM documents
),
t AS (
  SELECT doc_id,
         CASE WHEN norm = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(norm, ' ') END AS tok
  FROM n
),
g AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         md5(array_to_string(tok[i:i+{_SPAN_K - 1}], ' ')) AS gh
  FROM t, UNNEST(range(1, greatest(len(tok) - {_SPAN_K} + 2, 1))) AS s(i)
),
dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
p AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {_SPAN_K} THEN 0 ELSE 1 END AS brk
  FROM p
),
grp AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SPAN_K - 1} AS e
  FROM grp GROUP BY doc_id, island
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT)        AS n_spans,
       CAST(SUM(e - s + 1) AS BIGINT)  AS dup_tokens,
       CAST(MAX(e - s + 1) AS INT)     AS max_span_tokens
FROM spans
GROUP BY doc_id
"""


@query("repeated_substring_spans", oracle=_SPANS_ORACLE)
def repeated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring detection (suffix-array dedup restated for
    Spark): every repeated substring of ≥ k tokens is a union of duplicated
    k-gram windows, so flag duplicated k-gram starts (md5 gram hash —
    raw text never shuffles) and merge overlapping windows per doc into
    maximal spans (gaps-and-islands window). No pair generation anywhere —
    a gram occurring m times costs m rows, not m², so boilerplate cannot
    go quadratic. Output: per-doc span profile for docs containing
    repeated text."""
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    return repeated_span_profile(docs, k=_SPAN_K, min_occurrences=2)


# ---------------------------------------------------------------------------
# SCD2 dimension history (orders → per-customer priority versions)
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH lagged AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
),
v AS (
  SELECT o_custkey, o_orderpriority, o_orderdate,
         SUM(CASE WHEN prev IS NULL OR prev <> o_orderpriority
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
  FROM lagged
),
c AS (
  SELECT o_custkey, ver, o_orderpriority,
         MIN(o_orderdate) AS vf, COUNT(*) AS n_obs
  FROM v GROUP BY o_custkey, ver, o_orderpriority
)
SELECT o_custkey,
       CAST(ver AS INT)                 AS scd_version,
       o_orderpriority,
       epoch_us(vf)                     AS valid_from_us,
       epoch_us(LEAD(vf) OVER (PARTITION BY o_custkey ORDER BY ver)) AS valid_to_us,
       CAST(n_obs AS BIGINT)            AS n_observations,
       CAST(CASE WHEN LEAD(vf) OVER (PARTITION BY o_custkey ORDER BY ver)
                      IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM c
"""


@query("scd2_priority_history", oracle=_SCD2_ORACLE)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 assembly (operators/scd.py): each customer's order-
    priority observations collapse into validity-interval versions — the
    history-keeping upgrade of the reference's drop-and-recreate dimension
    sink (fetch_youtube_data.py:198). One shuffle on the key; the
    interval-closing lead() runs on the collapsed (per-version) relation,
    not per-observation."""
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    hist = scd2_history(
        obs,
        key_cols=["o_custkey"],
        attr_cols=["o_orderpriority"],
        order_cols=["o_orderdate", "o_orderkey"],
    )
    return hist.select(
        "o_custkey",
        "scd_version",
        "o_orderpriority",
        # o_orderdate is parquet TIMESTAMP_NTZ; the session TZ is UTC, so
        # the cast preserves wall-clock and unix_micros == DuckDB epoch_us.
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.col("valid_to").cast("timestamp")).alias("valid_to_us"),
        "n_observations",
        "is_current",
    )


# ---------------------------------------------------------------------------
# Per-group capping (documents by lang — the "domain cap" curation step)
# ---------------------------------------------------------------------------

_CAP = 100  # per-lang cap; 'en' is over at sf0.01, keeping both paths live

_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rn
  FROM documents
),
kept AS (SELECT lang, doc_id FROM ranked WHERE rn <= {_CAP})
SELECT l.lang,
       l.n_docs,
       k.n_kept,
       k.kept_fp
FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang) l
JOIN (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
             md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS kept_fp
      FROM kept GROUP BY lang) k USING (lang)
"""


@query("lang_cap_docs", oracle=_CAP_ORACLE)
def lang_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group frequency cap (operators/capping.py — lang stands in for
    the domain/host key): at most {cap} docs per language, chosen by
    content-stable salted md5 rank. Two-path plan: under-cap groups pass
    with NO window sort (broadcast anti-join against the over-cap group
    list); only over-cap groups' rows pay the rank — at 100 TB that is the
    difference between sorting the whole corpus and sorting the hot tail.
    The oracle is the naive whole-corpus row_number form — results must be
    identical. The audit fingerprints each group's kept id set."""
    docs = load_table(spark, sf_dir, "documents")
    kept = cap_per_group(docs, group_col="lang", id_col="doc_id", cap=_CAP)
    audit = kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("kept_fp"),
    )
    totals = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return totals.join(audit, "lang").select("lang", "n_docs", "n_kept", "kept_fp")
