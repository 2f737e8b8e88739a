"""Null-handling scalar helpers (SURVEY.md §2.4 T1-T4, T10; §2.6 policies)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_long_or_zero(col: Column | str) -> Column:
    """``fillna(0).astype(int)`` parity (fetch_youtube_data.py:172-174):
    NULL→0, then cast; unparseable strings also land on 0 (try_cast keeps
    this total under ANSI mode — the reference crashes instead, SURVEY §2.6)."""
    return F.coalesce(_c(col).try_cast("long"), F.lit(0))


def null_safe_size(col: Column | str) -> Column:
    """``len(x) if x else 0`` over arrays (fetch_youtube_data.py:176):
    NULL→0, []→0 (pandas ``if x`` is falsy for [] — same result)."""
    sz = F.size(_c(col))
    # spark.sql.legacy.sizeOfNull would yield -1; clamp for safety.
    return F.when(sz > 0, sz).otherwise(F.lit(0))


def null_safe_length(col: Column | str) -> Column:
    """``len(x) if x else 0`` over strings (fetch_youtube_data.py:177)."""
    return F.coalesce(F.length(_c(col)), F.lit(0)).cast("int")


def safe_ratio(num: Column | str, denom: Column | str, scale: float = 1.0) -> Column:
    """Ratio with NULL-on-zero-denominator (engine policy, SURVEY.md §2.6
    item 1; pandas emitted inf/NaN at fetch_youtube_data.py:189-190 — NULL is
    the storable, join-safe choice). ANSI-portable as x / NULLIF(y, 0)."""
    n = _c(num).cast("double")
    d = F.nullif(_c(denom).cast("double"), F.lit(0.0))
    return n / d * F.lit(scale)
