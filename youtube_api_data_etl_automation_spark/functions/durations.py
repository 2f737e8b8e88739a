"""ISO-8601 duration parsing as a pure Column expression (SURVEY.md §2.4 T9).

The reference parses durations row-at-a-time with isodate
(fetch_youtube_data.py:184-186) and crashes on NULL (no guard, while :133
admits NULL — SURVEY.md §2.6 item 3). Engine policy: NULL-in → NULL-out,
malformed-in → NULL-out, and the whole computation is a compound of built-in
expressions (regexp_extract / cast / arithmetic) so it stays JVM-side inside
whole-stage codegen — no Python UDF, no Catalyst extension needed.

Supported grammar (the YouTube API emits only PT…/P…DT… forms):
    P[nW]            — weeks
    P[nD][T[nH][nM][n[.n]S]]
    P0D, PT0S        — zero durations
Date-part years/months are rejected (NULL): the reference's own parser
returns a non-timedelta for those, so total_seconds() was never defined.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Full-string validity gate. Requires at least one component (bare "P"/"PT"
# invalid); fractional seconds allowed.
_ISO_DUR_RE = (
    r"^P(?=.)(?:(?:\d+W)|(?:\d+D)?(?:T(?=\d)(?:\d+H)?(?:\d+M)?(?:\d+(?:\.\d+)?S)?)?)$"
)


def _component(c: Column, pattern: str, mult: float) -> Column:
    """Extract one numeric component; missing component contributes 0."""
    raw = F.regexp_extract(c, pattern, 1)
    # try_cast: missing component extracts '' — must yield 0, not an ANSI
    # cast error (Spark 4 defaults to ANSI mode).
    return F.coalesce(raw.try_cast("double"), F.lit(0.0)) * F.lit(mult)


def iso8601_duration_seconds(col: Column | str) -> Column:
    """Total seconds of an ISO-8601 duration string; NULL on NULL/malformed.

    Differential-tested against a pure-Python reference parser in
    tests/test_duration_property.py (hypothesis), and against arithmetic
    oracles in the driver's DuckDB check (query ``iso_duration_seconds``).
    """
    c = F.col(col) if isinstance(col, str) else col
    # Split date-part vs time-part so 'M' is unambiguous (minutes only live
    # after 'T'; our grammar rejects date-part months anyway, belt+braces).
    date_part = F.substring_index(c, "T", 1)
    time_part = F.when(c.contains("T"), F.substring_index(c, "T", -1)).otherwise(F.lit(""))
    total = (
        _component(date_part, r"(\d+)W", 604800.0)
        + _component(date_part, r"(\d+)D", 86400.0)
        + _component(time_part, r"(\d+)H", 3600.0)
        + _component(time_part, r"(\d+)M", 60.0)
        + _component(time_part, r"(\d+(?:\.\d+)?)S", 1.0)
    )
    return F.when(c.isNull() | ~c.rlike(_ISO_DUR_RE), F.lit(None).cast("double")).otherwise(total)
