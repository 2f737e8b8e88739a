"""Timestamp-part helpers (SURVEY.md §2.4 T5-T8).

The session timezone is pinned to UTC (session.py) so these match the
reference's UTC-tz pandas semantics (fetch_youtube_data.py:179-182).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The API wire format the reference parses (fetch_youtube_data.py:179).
API_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ts_parse_utc(col: Column | str, fmt: str = API_TS_FORMAT) -> Column:
    """``pd.to_datetime(..., errors='coerce')`` parity: NULL on failure
    (try_to_timestamp — plain to_timestamp throws under ANSI mode)."""
    return F.try_to_timestamp(_c(col), F.lit(fmt))


def time_of_day(col: Column | str) -> Column:
    """``.dt.time`` parity as 'HH:mm:ss' string (Spark has no TIME type)."""
    return F.date_format(_c(col), "HH:mm:ss")


def day_name(col: Column | str) -> Column:
    """``.dt.day_name()`` parity → 'Monday'… (locale-stable English)."""
    return F.date_format(_c(col), "EEEE")
