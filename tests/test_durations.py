"""T9 ISO-8601 duration parser: edge cases + hypothesis differential test
against a pure-Python reference implementation (SURVEY.md §5 item 4).

The reference repo used isodate (fetch_youtube_data.py:184-186); isodate is
not installed here, so the differential target is a transparent re-statement
of the supported grammar.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.functions import iso8601_duration_seconds

_PY_RE = re.compile(
    r"^P(?=.)(?:(?P<w>\d+)W|(?:(?P<d>\d+)D)?"
    r"(?:T(?=\d)(?:(?P<h>\d+)H)?(?:(?P<m>\d+)M)?(?:(?P<s>\d+(?:\.\d+)?)S)?)?)$"
)


def py_parse(s: str | None) -> float | None:
    """Pure-Python reference parser for the engine's supported grammar."""
    if s is None:
        return None
    m = _PY_RE.match(s)
    if not m:
        return None
    g = {k: v for k, v in m.groupdict().items() if v is not None}
    return (
        float(g.get("w", 0)) * 604800.0
        + float(g.get("d", 0)) * 86400.0
        + float(g.get("h", 0)) * 3600.0
        + float(g.get("m", 0)) * 60.0
        + float(g.get("s", 0))
    )


def spark_parse(spark, values: list[str | None]) -> list[float | None]:
    df = spark.createDataFrame([(v,) for v in values], "d string")
    return [r.s for r in df.select(iso8601_duration_seconds("d").alias("s")).collect()]


EDGE_CASES = [
    ("PT1H2M3S", 3723.0),
    ("P3DT4H5M6S", 273906.0),
    ("P0D", 0.0),
    ("PT0S", 0.0),
    ("P2W", 1209600.0),
    ("PT1M3.5S", 63.5),
    ("PT45S", 45.0),
    ("PT10M", 600.0),
    ("P1D", 86400.0),
    ("P", None),  # bare designator — invalid
    ("PT", None),
    ("", None),
    ("garbage", None),
    ("1H", None),
    ("P1Y2M", None),  # year/month rejected (isodate yields non-timedelta)
    ("P-1D", None),
    ("PT-5S", None),  # signed components rejected everywhere
    ("-PT5S", None),
    ("PT1.5S", 1.5),  # bare fractional seconds
    ("P1W2D", None),  # weeks don't combine with other designators
    ("1|2|3|4|5", None),  # adversarial: already looks like the canonical rewrite
    ("||||", None),
    ("5||||", None),
    (None, None),
]


def test_edge_cases(spark):
    vals = [v for v, _ in EDGE_CASES]
    got = spark_parse(spark, vals)
    for (v, want), g in zip(EDGE_CASES, got):
        assert g == want, f"{v!r}: want {want}, got {g}"


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.builds(
                lambda d, h, m, s: f"P{d}DT{h}H{m}M{s}S",
                st.integers(0, 400),
                st.integers(0, 48),
                st.integers(0, 120),
                st.integers(0, 120),
            ),
            st.builds(lambda h: f"PT{h}H", st.integers(0, 10000)),
            st.builds(lambda w: f"P{w}W", st.integers(0, 500)),
            st.builds(
                lambda m, s, frac: f"PT{m}M{s}.{frac}S",
                st.integers(0, 59),
                st.integers(0, 59),
                st.integers(0, 999),
            ),
            st.text(
                alphabet="PTDHMSW0123456789.|-", min_size=0, max_size=12
            ),  # adversarial near-grammar strings ('|' probes the
            # canonical-rewrite gate, '-' probes signed forms)
        ),
        min_size=1,
        max_size=50,
    )
)
def test_differential_vs_python(spark, values):
    got = spark_parse(spark, values)
    want = [py_parse(v) for v in values]
    assert got == want


def test_null_in_null_out_policy(spark):
    """SURVEY.md §2.6 item 3: the reference crashes on NULL duration; the
    engine's policy is NULL-in → NULL-out."""
    assert spark_parse(spark, [None]) == [None]
