"""Benchmark decontamination: flag corpus docs sharing word n-grams with an
evaluation set.

Standard LLM-pretraining hygiene (GPT-3/PaLM-style n-gram overlap checks):
any training document that contains an n-gram also present in a held-out
benchmark is flagged (and usually dropped) so downstream evals aren't
contaminated. Real pipelines use 8–13-gram windows; the synthetic corpus'
tiny vocabulary makes 3-grams the scale-equivalent demo (TESTDATA.md).

Scale shape (100 TB corpus, fixed-size benchmark):
- benchmark n-grams come from a *filtered* scan (small by construction),
  are distinct-reduced, and broadcast — the corpus side never shuffles its
  n-grams;
- the only corpus shuffle is the per-doc hit aggregation, carrying
  (doc_id, n-gram) pairs for *matching* n-grams only;
- no persist: the benchmark branch re-scans only the benchmark slice, which
  is cheaper than materializing the exploded corpus n-gram relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def word_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int, *, unique: bool = False
) -> DataFrame:
    """Explode ``df`` into (id, g) word n-grams of the normalized text.

    Docs shorter than ``n`` tokens contribute no rows (inner explode) —
    mirrored by the oracle's ``range(1, greatest(len-n+1, 1))``.

    ``unique=True`` dedupes each doc's grams with array_distinct BEFORE the
    explode: a within-partition array op that replaces a post-explode
    two-phase COUNT DISTINCT — fewer exploded rows and no gram-keyed
    exchange (pinned by tests/test_scale_plans.py).

    The token array is projected to a real column BEFORE the transform()
    lambda references it: transform is interpreted, so an inline tokens()
    expression would re-normalize + re-split the text once per n-gram
    position (the word_shingles_t trap, functions/text.py — measured ~7×).
    """
    from ..functions.text import word_shingles_t

    grams = word_shingles_t(F.col("__ng_toks"), n)
    if unique:
        grams = F.array_distinct(grams)
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__ng_toks"))
        .select(F.col(id_col), F.explode(grams).alias("g"))
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-corpus-doc benchmark-overlap report.

    Returns (id_col, n_hit_ngrams, contaminated) for EVERY corpus doc —
    clean docs appear with 0/false so the result is a complete keep/drop
    verdict, joinable back onto the corpus by key.
    """
    bench_grams = word_ngrams(benchmark, text_col, id_col, n).select("g").distinct()
    # Corpus grams are per-doc-deduped at explode time (unique=True), so a
    # plain COUNT after the broadcast join IS the distinct-hit count — one
    # single-phase agg exchange carrying only matching (doc, gram) pairs.
    hits = (
        word_ngrams(corpus, text_col, id_col, n, unique=True)
        .join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_ngrams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_ngrams", F.lit(0)).cast("long").alias("n_hit_ngrams"),
            # 0/1 bigint, not boolean: no driver-checked query had ever
            # emitted a boolean through the canonicalizer (the r1 tags-array
            # err taught that lesson about first-of-a-type columns).
            (F.coalesce("n_hit_ngrams", F.lit(0)) > 0)
            .cast("long")
            .alias("contaminated"),
        )
    )
