"""BPE (byte-pair-encoding) tokenizer-training primitives.

Tokenizer training is the one corpus-scale job that precedes every LLM
pretraining run: count adjacent symbol pairs over the whole corpus, merge
the most frequent pair, repeat. Each round is embarrassingly aggregable —
the distributed shape is

    pair counts  = explode(adjacent pairs) → partial-aggregated groupBy
    best pair    = one-row top-1 aggregate (driver-side control, O(1))
    apply merge  = map-side fold over each token array (no shuffle)

so a training round costs one count-shuffle of (pair, partial_count) rows
— never raw text — plus a map pass. Both steps are pure Column
expressions (higher-order transform/aggregate), no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Merged tokens are joined with U+241F (symbol-for-unit-separator). It is
# printable (NOT whitespace), so a hostile/unlucky corpus token could
# contain it and collide with a merged token — sanitize untrusted corpora
# (filter or map tokens containing SEP) before training; the training
# loop itself never introduces ambiguity because pair identity flows
# through struct keys, not the joined string.
SEP = "␟"


def adjacent_pairs_t(tok: Column | str) -> Column:
    """Array of adjacent-token pairs (struct<a,b>) of a pre-projected token
    array; <2 tokens → empty. Struct pairs, NOT joined strings: merged
    tokens contain the separator themselves, so a concatenated pair key
    would become ambiguous after the first merge round. transform over an
    index sequence — the same shingle idiom as word_shingles_t (tokens
    must be a plain column reference, see functions/text.py::tokens perf
    note)."""
    t = F.col(tok) if isinstance(tok, str) else tok
    n = F.size(t)
    idx = F.sequence(F.lit(1), n - 1)
    pair = lambda i: F.struct(  # noqa: E731
        F.element_at(t, i).alias("a"), F.element_at(t, i + 1).alias("b")
    )
    empty = F.array().cast("array<struct<a:string,b:string>>")
    return F.when(n >= 2, F.transform(idx, pair)).otherwise(empty)


def pair_counts(docs: DataFrame, *, tok_col: str = "tok") -> DataFrame:
    """Corpus-wide adjacent-pair frequencies: (a, b, n_pairs), descending.
    The explode feeds a partial-aggregated groupBy, so the exchange
    carries (pair, partial_count) — bounded by |vocab|² per partition,
    not corpus size."""
    pairs = docs.select(F.explode(adjacent_pairs_t(tok_col)).alias("p"))
    return (
        pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("a"), F.asc("b"))
    )


def apply_merge_t(tok: Column | str, a: str, b: str) -> Column:
    """Replace every non-overlapping leftmost occurrence of the adjacent
    pair (a, b) in a token array with the merged token 'a␟b' — one BPE
    merge, as a single map-side fold (no shuffle, no UDF).

    The fold carries (out, pending, has_pend): each step either completes
    a merge (pending==a and current==b), or flushes pending and holds the
    current token; finish flushes the final pending. The explicit
    ``has_pend`` flag (r6) distinguishes "nothing held" from "holding a
    NULL token" — keying the flush on pend.isNull would silently DROP a
    NULL array element (it would look like the empty initial state), and
    array_insert/concat quirks aside, a caller-supplied token array may
    legally contain NULLs even though tokens() never emits them. 'a a a'
    under merge (a,a) → ['a␟a', 'a'] — standard leftmost-first BPE
    semantics."""
    t = F.col(tok) if isinstance(tok, str) else tok
    merged = a + SEP + b

    def flush(acc: Column) -> Column:
        return F.when(
            acc.getField("has_pend"),
            F.concat(acc.getField("out"), F.array(acc.getField("pend"))),
        ).otherwise(acc.getField("out"))

    def step(acc: Column, x: Column) -> Column:
        is_merge = (
            acc.getField("has_pend")
            & acc.getField("pend").eqNullSafe(F.lit(a))
            & x.eqNullSafe(F.lit(b))
        )
        return F.when(
            is_merge,
            F.struct(
                F.concat(acc.getField("out"), F.array(F.lit(merged))).alias("out"),
                F.lit(None).cast("string").alias("pend"),
                F.lit(False).alias("has_pend"),
            ),
        ).otherwise(
            F.struct(
                flush(acc).alias("out"),
                x.alias("pend"),
                F.lit(True).alias("has_pend"),
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
        F.lit(False).alias("has_pend"),
    )
    return F.aggregate(t, init, step, flush)


def train_merges(docs: DataFrame, n_merges: int, *, tok_col: str = "tok") -> list[tuple[str, str]]:
    """Run ``n_merges`` BPE training rounds; returns the learned merge list
    in order. Per round: one pair-count aggregate (top-1 collapses to a
    single driver row — O(1) control data, the sanctioned collect class),
    one map-side apply_merge re-projection. The token relation is
    localCheckpoint'd per round so the fold chain doesn't deepen the plan
    exponentially (same iterative discipline as k-means/CC/PageRank)."""
    cur = docs.select(tok_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = pair_counts(cur, tok_col=tok_col).first()
        if top is None or top["n_pairs"] < 2:
            break
        a, b = top["a"], top["b"]
        merges.append((a, b))
        cur = cur.select(
            apply_merge_t(tok_col, a, b).alias(tok_col)
        ).localCheckpoint()
    return merges


def bpe_encode_t(tok: Column | str, merges: list[tuple[str, str]]) -> Column:
    """Apply a trained merge list IN ORDER to a token-array column — the
    inference half of the tokenizer (training learns the list,
    ``train_merges``; this applies it to new text). A pure composition of
    ``apply_merge_t`` folds: map-side, no shuffle, no UDF. Plan depth
    grows with ``len(merges)`` — for long merge lists encode through
    :func:`bpe_encode_corpus`, which checkpoints every few merges."""
    c = F.col(tok) if isinstance(tok, str) else tok
    for a, b in merges:
        c = apply_merge_t(c, a, b)
    return c


def bpe_encode_corpus(docs: DataFrame, merges: list[tuple[str, str]],
                      *, tok_col: str = "tok",
                      checkpoint_every: int = 8) -> DataFrame:
    """Encode a whole corpus with a trained merge list. Merges apply in
    chunks of ``checkpoint_every`` with a localCheckpoint between chunks,
    so the fold-expression depth stays bounded regardless of vocabulary
    size (the same plan-depth discipline as ``train_merges``). Returns
    ``docs`` with ``tok_col`` replaced by the encoded arrays."""
    cur = docs
    for i in range(0, len(merges), checkpoint_every):
        chunk = merges[i : i + checkpoint_every]
        cur = cur.withColumn(tok_col, bpe_encode_t(tok_col, chunk))
        if i + checkpoint_every < len(merges):
            cur = cur.localCheckpoint()
    return cur
