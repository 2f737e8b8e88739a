"""SimHash document fingerprinting + Hamming-banded near-dup pairs.

16-bit SimHash over distinct tokens: bit j of a token's contribution is the
parity of hex digit j of md5(token) (md5 keeps it engine-portable — the
DuckDB oracle reproduces it digit-for-digit). A document's bit j is the sign
of the sum of contributions (±1) across its distinct tokens.

Scale shape: one explode (doc → distinct tokens), one groupBy(doc) computing
all 16 bit-sums in a single shuffle, then near-dup candidates come from an
equi-join on byte-halves of the signature (Hamming-LSH banding), scored by
exact bit_count(xor).

Recall bound (pigeonhole, 2 bands of 8 bits): a pair is GUARANTEED to share
an exact half only when total Hamming distance ≤ 1. At distance d ≥ 2 the
differing bits can split across both halves (e.g. 2+2 at d=4) and the pair
is missed — banding is probabilistic-recall above d=1. For guaranteed recall
at d ≤ 3 use 4 bands of 4 bits (or multiple bit rotations); the 2×8 layout
here trades that recall for 4× fewer join rows.

SCALE BOUND of the 16-bit demo signature (r6 review): an 8-bit band key
has only 256 values, so past ~10⁵ docs every bucket fills and the band
self-join trends toward N²/256 candidate rows on 256 skewed keys — the
16-bit width is sized for oracle-checkable demonstrations, not corpus
scale. The production setting is a 64-bit signature with 4×16-bit bands
(65 536 bucket values per band, same Hamming-≤1-per-band guarantee at
d ≤ 3): the identical code path with N_BITS = 64 and 16-bit band
extraction, at the cost of a longer oracle mirror. The df-capped MinHash
family (operators/dedup.py) is the first choice when banding skew is the
binding constraint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

N_BITS = 16


def _digit_parity(hx: F.Column, j: int) -> F.Column:
    """Parity of hex digit j of a pre-computed md5 hex digest → ±1."""
    digit = F.conv(F.substring(hx, j + 1, 1), 16, 10).cast("int") % 2
    return digit * 2 - 1


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) with simhash in [0, 2^16). Docs with no tokens get
    no row (no signal to hash)."""
    # explode_outer + post-filter, not explode: see operators.dedup.doc_shingles
    # — plain explode infers a size()>0 filter that Catalyst pushes below the
    # repartition, duplicating the tokenize tree in a pre-exchange Filter.
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode_outer(tokens(text_col)).alias("tok"))
        .filter(F.col("tok").isNotNull())
        .distinct()
    )
    # md5 projected ONCE per (doc, token); the 16 per-bit aggregates read
    # hex digits of the projected digest (inlining md5 into each aggregate
    # expression would hash every row 16x).
    hashed = toks.select("doc_id", F.md5("tok").alias("hx"))
    sums = hashed.groupBy("doc_id").agg(
        *[F.sum(_digit_parity(F.col("hx"), j)).alias(f"b{j}") for j in range(N_BITS)]
    )
    sig = None
    for j in range(N_BITS):
        bit = (F.col(f"b{j}") > 0).cast("long") * F.lit(1 << j)
        sig = bit if sig is None else sig + bit
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share a signature half
    (Hamming-LSH band join), scored by exact Hamming distance.

    Recall is guaranteed only for pairs at Hamming distance ≤ 1 (see module
    docstring); with the default ``max_hamming=4``, pairs whose differing
    bits split across both halves are (deliberately) missed — the oracle
    mirrors the same banding, so parity holds by construction."""
    sig = simhash(docs, text_col, id_col)
    halves = sig.select(
        "doc_id",
        "simhash",
        (F.col("simhash") % 256).alias("lo"),
        F.floor(F.col("simhash") / 256).cast("long").alias("hi"),
    ).persist()  # reused by both band joins and both sides of each

    def band_join(band: str) -> DataFrame:
        # Equi-join per band (an OR across bands would force a nested-loop
        # cross join; the union-of-equi-joins form stays hash-partitioned).
        a, b = halves.alias("a"), halves.alias("b")
        return a.join(
            b,
            (F.col(f"a.{band}") == F.col(f"b.{band}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )

    cand = band_join("lo").unionByName(band_join("hi")).distinct()
    return cand.filter(F.col("hamming") <= max_hamming)
