"""Fuzzy (edit-distance ≤ 1) self-join via symmetric-delete blocking —
entity resolution for keys and names at corpus scale.

A capture pipeline accumulates near-identical keys (the reference's own
data has this shape: `videoId` vs `videoid` case drift,
fetch_youtube_data.py:155 — typo-level variants of the same entity).
Finding them is a similarity self-join: all pairs within Levenshtein
distance 1 (after whatever normalization the caller applies).

Brute force is O(N²) string comparisons — a scale-killer. The symmetric-
delete trick (SymSpell): every string emits itself plus each single-
character deletion as blocking keys (L+1 keys for length L). Two strings
within distance 1 — one substitution, insertion, or deletion — ALWAYS
share a key (delete the edited position from whichever side has it), so
the candidate set provably contains every true pair; exact Levenshtein
then verifies. Candidates come from a hash equi-join on the key — never a
nested loop [pinned by tests/test_fuzzy.py].

This targets key/name-length strings (L+1 keys per row). Document-level
near-dup is the MinHash/SimHash family (operators/dedup.py); this is its
short-string sibling, same candidate-then-verify architecture.

Cost honesty: there are TWO shuffles — the blocking-key equi-join and the
candidate ``distinct`` (which carries both text payloads) — and candidate
volume is quadratic in any one key's document frequency (ubiquitous keys
come from very short strings, whose deletion neighborhoods degenerate to
'' and single characters, and from mass-duplicated strings). The
``max_key_df`` cap bounds that: keys shared by more than ``max_key_df``
rows are dropped from blocking via a broadcast anti-join (the same hot-key
lever as the stop-shingle cap, operators/dedup.py). With the cap active,
recall is exact EXCEPT among rows whose every shared key is hot — in
practice mass-duplicate clusters, which belong to exact dedup
(fingerprint groupBy), not edit-distance search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_keys(col) -> "F.Column":
    """The string plus every single-character-deletion variant."""
    s = F.col(col) if isinstance(col, str) else col
    variants = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            # substring(start, len): everything after position i.
            s.substr(i + 1, F.length(s)),
        ),
    )
    return F.array_distinct(F.concat(F.array(s), variants))


def fuzzy_self_pairs(
    df: DataFrame, id_col: str, text_col: str, max_key_df: int | None = None
) -> DataFrame:
    """All (id_a < id_b) pairs with levenshtein(text_a, text_b) <= 1.

    Returns (id_a, id_b, dist). Recall is exact with ``max_key_df=None``
    (the deletion-neighborhood join is a provable superset of the
    distance-≤1 pairs); with a cap, hot blocking keys are dropped first —
    see the module docstring for the shuffle/cost inventory and the
    cap's recall caveat."""
    base = df.select(
        F.col(id_col).alias("_fid"), F.col(text_col).alias("_ftxt")
    ).filter(F.col("_ftxt").isNotNull())
    keyed = base.select(
        "_fid", "_ftxt", F.explode(deletion_keys(F.col("_ftxt"))).alias("k")
    )
    if max_key_df is not None:
        hot = (
            keyed.groupBy("k")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_key_df)
            .select("k")
        )
        keyed = keyed.join(F.broadcast(hot), "k", "left_anti")
    a = keyed.select(
        F.col("_fid").alias("id_a"), F.col("_ftxt").alias("txt_a"), "k"
    )
    b = keyed.select(
        F.col("_fid").alias("id_b"), F.col("_ftxt").alias("txt_b"), "k"
    )
    cands = (
        a.join(b, "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "txt_a", "txt_b")
        .distinct()
    )
    return cands.select(
        "id_a", "id_b", F.levenshtein("txt_a", "txt_b").alias("dist")
    ).filter(F.col("dist") <= 1)
