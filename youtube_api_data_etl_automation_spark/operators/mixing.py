"""Temperature-based source mixing: size^alpha sampling rates per source.

The multi-source corpus recipe (T5/multilingual-LM style): sampling a
source proportionally to size^alpha (0 < alpha < 1) upweights small
sources and damps giant ones; alpha=1 is natural proportions, alpha=0 is
uniform. This operator computes the per-source keep/repeat rates that
realize a target output size, then applies them deterministically.

Scale shape: stage 1 is a tiny per-source count aggregate (one map-side-
combined shuffle); stage 2 broadcasts the rate table and applies a
content-stable md5-bucket filter (same idiom as train_val_split /
stratified_sample_docs — a doc's fate never changes under repartitioning
or corpus growth) plus an integer repeat-explode for rates > 1 (epoch
upweighting). No driver loop; the rate table is collected (O(#sources))
as a sanctioned control-plane decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mixture_rates(
    df: DataFrame, source_col: str, alpha: float, target_rows: int
) -> DataFrame:
    """Per-source sampling rate so expected output ≈ target_rows with
    p(source) ∝ n_source^alpha. Returns (source, n_rows, rate); rate may
    exceed 1 (repeat small sources)."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_rows"))
    total_w = counts.agg(
        F.sum(F.pow(F.col("n_rows").cast("double"), F.lit(alpha))).alias("tw")
    )
    return counts.crossJoin(F.broadcast(total_w)).select(
        source_col,
        "n_rows",
        (
            F.lit(float(target_rows))
            * F.pow(F.col("n_rows").cast("double"), F.lit(alpha))
            / F.col("tw")
            / F.col("n_rows")
        ).alias("rate"),
    )


def apply_mixture(
    df: DataFrame,
    rates: DataFrame,
    *,
    source_col: str,
    id_col: str,
) -> DataFrame:
    """Materialize the mix deterministically: each row repeats
    floor(rate) times, plus one more iff its md5 bucket < frac(rate)·256
    (content-stable fractional sampling). Output adds ``copy_idx``."""
    joined = df.join(F.broadcast(rates.select(source_col, "rate")), source_col)
    whole = F.floor("rate").cast("int")
    frac = F.col("rate") - whole
    hex2 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    bucket = F.conv(hex2, 16, 10).cast("int")
    extra = (bucket < frac * 256).cast("int")
    n_copies = (whole + extra).alias("n_copies")
    return (
        joined.withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(1), F.col("n_copies")))
        )
        .drop("rate", "n_copies")
    )
