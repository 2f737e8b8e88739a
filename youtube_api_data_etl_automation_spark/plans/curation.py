"""Corpus-curation queries: PII redaction, benchmark decontamination, and
stratified source sampling.

These are the LLM-data-pipeline steps a 100 TB curation run layers on top of
the reference's capture ETL (fetch_youtube_data.py:129-200 captures and
normalizes the raw records; curation then decides what ships): strip PII,
drop eval-set contamination, and rebalance the language/source mix. Every
query is a pure-Column plan with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    email_count,
    ipv4_count,
    phone_count,
    redact_pii,
)
from ..functions.rounding import round6, sql_round6
from ..operators.decontam import ngram_contamination
from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------------------------------
# PII detection + redaction (documents)
# ---------------------------------------------------------------------------

# The synthetic corpus contains no contact strings, so the query plants
# deterministic PII derived from doc_id on a subset of docs (different
# moduli → emails/IPs/phones appear independently and sometimes together),
# then detects and redacts it. Both engines build the identical augmented
# text, so the oracle checks the real detection/redaction machinery with a
# non-trivial, varying signal.
_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example' ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                 || '.' || CAST((doc_id * 7) % 200 AS VARCHAR)
                 || '.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR)
                 || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT)  AS n_emails,
       CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS INT)   AS n_ipv4,
       CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INT)  AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
            '{EMAIL_RE}', '[EMAIL]', 'g'),
            '{IPV4_RE}', '[IP]', 'g'),
            '{PHONE_RE}', '[PHONE]', 'g'))                    AS redacted_fp
FROM aug
"""


@query("pii_redact_docs", oracle=_PII_ORACLE)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: count emails/IPv4s/phone numbers, then
    redact them to bracket tokens; the oracle compares the md5 of the
    redacted text, proving byte-identical redaction without hauling bodies
    through the driver. Map-only (no shuffle) — the 100 TB cost is one
    codegen'd scan, and the redacted column ships in the same pass
    (rebalance spreads the regex compute off the single-row-group input)."""
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" reach user"), did.cast("string"), F.lit("@mail.example")),
        ).otherwise(""),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" from 10."),
                (did % 200).cast("string"),
                F.lit("."),
                ((did * 7) % 200).cast("string"),
                F.lit("."),
                (did % 250).cast("string"),
            ),
        ).otherwise(""),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" call 555-"),
                (did % 900 + 100).cast("string"),
                F.lit("-"),
                (did % 9000 + 1000).cast("string"),
            ),
        ).otherwise(""),
    )
    return docs.select(
        "doc_id",
        email_count(aug).alias("n_emails"),
        ipv4_count(aug).alias("n_ipv4"),
        phone_count(aug).alias("n_phones"),
        F.md5(redact_pii(aug)).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (documents)
# ---------------------------------------------------------------------------

_DECONTAM_N = 3  # real pipelines: 8–13; tiny synthetic vocab → 3 is the demo scale

_DECONTAM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ts
  FROM documents
),
ng AS (
  SELECT doc_id, array_to_string(ts[i:i+{_DECONTAM_N - 1}], ' ') AS g
  FROM tok, UNNEST(range(1, greatest(len(ts) - {_DECONTAM_N - 2}, 1))) AS s(i)
),
bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % 97 = 0),
hits AS (
  SELECT ng.doc_id, CAST(COUNT(DISTINCT ng.g) AS BIGINT) AS n_hit_ngrams
  FROM ng JOIN bench USING (g)
  WHERE ng.doc_id % 97 <> 0
  GROUP BY ng.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_hit_ngrams, 0) AS BIGINT) AS n_hit_ngrams,
       CAST(CASE WHEN COALESCE(h.n_hit_ngrams, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""


@query("decontam_ngram_hits", oracle=_DECONTAM_ORACLE)
def decontam_ngram_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: docs with doc_id % 97 == 0 stand in for the
    held-out benchmark; every other doc is checked for word-n-gram overlap
    against it (operators/decontam.py — benchmark n-grams broadcast, corpus
    n-grams never shuffle, per-doc hit agg is the only exchange). The
    corpus side rebalances (the n-gram explode is the compute hot spot and
    the input is a single row group); the benchmark slice stays tiny."""
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    is_bench = F.col("doc_id") % 97 == 0
    return ngram_contamination(
        docs.filter(~is_bench), docs.filter(is_bench), n=_DECONTAM_N
    )


# ---------------------------------------------------------------------------
# Stratified source sampling (documents)
# ---------------------------------------------------------------------------

# Per-language keep-rates out of 256 hash buckets: downsample the
# over-represented languages, keep the rare ones whole — the "domain
# mixing" step of corpus assembly. Content-stable (md5 of the id): a doc's
# keep/drop verdict never changes as the corpus grows or repartitions.
_RATE_CASE_SQL = """CASE lang WHEN 'en' THEN 128 WHEN 'fr' THEN 64
                    WHEN 'es' THEN 64 WHEN 'de' THEN 256 ELSE 32 END"""

_STRATIFIED_ORACLE = f"""
WITH h AS (
  SELECT lang, n_chars,
         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket,
         {_RATE_CASE_SQL} AS thr
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT)                                   AS n_docs,
       CAST(SUM(CASE WHEN bucket < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN bucket < thr THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars,
       {sql_round6('ANY_VALUE(thr) / 256.0')}                     AS target_rate,
       {sql_round6('CAST(SUM(CASE WHEN bucket < thr THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)')} AS achieved_rate
FROM h
GROUP BY lang
"""


@query("stratified_sample_docs", oracle=_STRATIFIED_ORACLE)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling by language: keep-rate per
    stratum via content-stable md5 bucket (same idiom as train_val_split —
    reproducible across engines/runs/partitionings). The keep decision is a
    map-side projection; the audit aggregate is the only shuffle. At 100 TB
    the same expression feeds a filter instead of an audit — zero-shuffle
    sampling with exact, auditable per-stratum rates."""
    from ..functions.hashing import md5_bucket

    docs = load_table(spark, sf_dir, "documents")
    # Unsalted bucket: pinned by the oracle text (see functions/hashing.py
    # on why COMPOSING operators must salt instead).
    bucket = md5_bucket("doc_id")
    thr = (
        F.when(F.col("lang") == "en", 128)
        .when(F.col("lang") == "fr", 64)
        .when(F.col("lang") == "es", 64)
        .when(F.col("lang") == "de", 256)
        .otherwise(32)
    )
    kept = (bucket < thr).cast("int")
    return (
        docs.select("lang", "n_chars", kept.alias("kept"), thr.alias("thr"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").cast("long").alias("n_sampled"),
            F.sum(F.col("kept") * F.col("n_chars")).cast("long").alias("sampled_chars"),
            round6(F.any_value(F.col("thr")) / F.lit(256.0)).alias("target_rate"),
            round6(
                F.sum("kept").cast("double") / F.count(F.lit(1))
            ).alias("achieved_rate"),
        )
    )
