"""quarantine_split: first-fail attribution, schema preservation, and
lossless partition of the input."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.operators.quarantine import (
    quarantine_split,
)
from youtube_api_data_etl_automation_spark.sources.tables import load_table

from .conftest import SF_DIR


def _rules():
    return [
        ("null_user", F.col("user_id").isNotNull()),
        ("nonpositive_value", F.col("value") > 0),
        ("unknown_type", F.col("event_type").isin("click", "view", "purchase", "scroll")),
    ]


def test_split_is_lossless_and_attributed(spark):
    ev = load_table(spark, SF_DIR, "events")
    good, bad = quarantine_split(ev, _rules())
    assert good.count() + bad.count() == ev.count()
    assert good.columns == ev.columns
    assert bad.columns == ev.columns + ["quarantine_reason"]
    # Good rows pass every rule.
    for name, cond in _rules():
        assert good.filter(~cond).count() == 0, name


def test_first_failing_rule_wins(spark):
    rows = [
        (1, None, 5.0, "click"),     # fails rule 1 (and would fail none else)
        (2, 10, -1.0, "click"),      # fails rule 2
        (3, 11, -2.0, "weird"),      # fails rules 2 AND 3 -> attributed to 2
        (4, 12, 3.0, "weird"),       # fails rule 3
        (5, 13, 3.0, "view"),        # clean
        (6, 14, None, "click"),      # NULL value: `value > 0` is NULL -> FAIL rule 2
        (7, 15, 2.0, None),          # NULL type: isin is NULL -> FAIL rule 3
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, event_type string"
    )
    good, bad = quarantine_split(df, _rules())
    reasons = {r.event_id: r.quarantine_reason for r in bad.collect()}
    assert reasons == {
        1: "null_user",
        2: "nonpositive_value",
        3: "nonpositive_value",
        4: "unknown_type",
        6: "nonpositive_value",
        7: "unknown_type",
    }
    assert [r.event_id for r in good.collect()] == [5]


def test_no_shuffle_in_split_plan(spark):
    ev = load_table(spark, SF_DIR, "events")
    good, bad = quarantine_split(ev, _rules())
    for side in (good, bad):
        plan = side._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
