"""Behavioral funnel (operators/funnel.py): greedy-earliest step
progression, hand-computed fixtures for ordering/window/drop-out edges.
The driver row `events_time_aggregates` (`funnel` section) covers the
cross-engine arithmetic; these pin the semantics."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.operators.funnel import (
    funnel,
    funnel_users,
)

_T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (u, t, _T0 + datetime.timedelta(seconds=s))
            for u, t, s in rows
        ],
        "user_id long, event_type string, ts timestamp_ntz",
    )


STEPS = ["signup", "click", "purchase"]


def test_funnel_hand_computed(spark):
    rows = [
        # u1: full journey in order
        (1, "signup", 0), (1, "click", 10), (1, "purchase", 20),
        # u2: purchase BEFORE click — greedy funnel must not count it,
        # and there is no later purchase, so u2 stops at click
        (2, "signup", 0), (2, "purchase", 5), (2, "click", 10),
        # u3: signup only
        (3, "signup", 0),
        # u4: clicks without signup — never enters
        (4, "click", 0), (4, "purchase", 10),
        # u5: out-of-order purchase but ALSO a later one — counts via
        # the later event
        (5, "signup", 0), (5, "purchase", 1), (5, "click", 2),
        (5, "purchase", 30),
        # noise types are ignored
        (1, "error", 15),
    ]
    out = {r["step"]: r for r in funnel(_ev(spark, rows), STEPS).collect()}
    assert [out[k]["event_type"] for k in (1, 2, 3)] == STEPS
    assert [out[k]["n_users"] for k in (1, 2, 3)] == [4, 3, 2]
    assert out[1]["conversion"] == 1.0
    assert out[2]["conversion"] == pytest.approx(0.75)
    assert out[3]["conversion"] == pytest.approx(0.5)


def test_funnel_strictly_later_and_dropout_nulls(spark):
    rows = [
        # same-timestamp click does NOT advance (strictly later required)
        (1, "signup", 0), (1, "click", 0),
        # u2 advances with a 1-second gap
        (2, "signup", 0), (2, "click", 1),
    ]
    per_user = {
        r["user_id"]: r
        for r in funnel_users(_ev(spark, rows), ["signup", "click"]).collect()
    }
    assert per_user[1]["t_2"] is None and per_user[1]["t_1"] is not None
    assert per_user[2]["t_2"] is not None
    # a user who dropped at step 2 has NULL for every later step
    rows3 = [(1, "signup", 0), (1, "purchase", 5)]
    u = funnel_users(_ev(spark, rows3), STEPS).collect()[0]
    assert u["t_2"] is None and u["t_3"] is None  # no click => no purchase


def test_funnel_within_window(spark):
    rows = [
        (1, "signup", 0), (1, "click", 5), (1, "purchase", 100),
        (2, "signup", 0), (2, "click", 5), (2, "purchase", 8),
    ]
    out = {
        r["step"]: r["n_users"]
        for r in funnel(_ev(spark, rows), STEPS, within_sec=10).collect()
    }
    assert out == {1: 2, 2: 2, 3: 1}  # u1's purchase is outside the window
    # the window bounds from STEP 1, not the previous step
    rows2 = [(1, "signup", 0), (1, "click", 9), (1, "purchase", 12)]
    out2 = {
        r["step"]: r["n_users"]
        for r in funnel(_ev(spark, rows2), STEPS, within_sec=10).collect()
    }
    assert out2[3] == 0


def test_funnel_counts_monotone_on_real_events(spark):
    from .conftest import SF_DIR
    from youtube_api_data_etl_automation_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    ns = [r["n_users"] for r in funnel(ev, STEPS).orderBy("step").collect()]
    assert ns[0] >= ns[1] >= ns[2] > 0


def test_funnel_validation_and_plan(spark):
    with pytest.raises(ValueError):
        funnel_users(_ev(spark, []), [])
    with pytest.raises(ValueError):
        funnel_users(_ev(spark, []), ["a", "a"])
    # plan: no cartesian/nested-loop join, no window, no collect-based op
    plan = (
        funnel(_ev(spark, [(1, "signup", 0)]), STEPS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowExec" not in plan and "collect_list" not in plan


def test_funnel_empty_entry_gives_null_conversion(spark):
    rows = [(1, "click", 0)]  # nobody signs up
    out = {r["step"]: r for r in funnel(_ev(spark, rows), STEPS).collect()}
    assert out[1]["n_users"] == 0 and out[1]["conversion"] is None


def test_retention_cohorts_hand_computed(spark):
    from youtube_api_data_etl_automation_spark.operators.funnel import (
        retention_cohorts,
    )

    rows = [
        # cohort day 0: u1 (returns d1, d2), u2 (returns d2), u3 (never)
        (1, "view", 0), (1, "view", 86_400), (1, "view", 2 * 86_400),
        (1, "view", 10),  # same-day second event: still ONE active day
        (2, "view", 50), (2, "view", 2 * 86_400 + 5),
        (3, "view", 99),
        # cohort day 1: u4 (returns d2)
        (4, "view", 86_400 + 3), (4, "view", 2 * 86_400 + 3),
    ]
    out = {
        (str(r["cohort_day"]), r["offset_days"]): r
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    d0, d1 = "2024-01-01", "2024-01-02"
    assert out[(d0, 0)]["n_active"] == 3 and out[(d0, 0)]["cohort_size"] == 3
    assert out[(d0, 1)]["n_active"] == 1
    assert out[(d0, 2)]["n_active"] == 2
    assert out[(d1, 0)]["cohort_size"] == 1 and out[(d1, 1)]["n_active"] == 1
    assert (d0, 3) not in out  # empty cells absent
    assert out[(d0, 2)]["retention"] == pytest.approx(2 / 3, abs=1e-6)
    # max_offset_days caps the matrix
    capped = retention_cohorts(_ev(spark, rows), max_offset_days=1).collect()
    assert max(r["offset_days"] for r in capped) <= 1


def test_retention_offset0_equals_cohort_size_on_real_events(spark):
    from .conftest import SF_DIR
    from youtube_api_data_etl_automation_spark.operators.funnel import (
        retention_cohorts,
    )
    from youtube_api_data_etl_automation_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    rows = retention_cohorts(ev).collect()
    day0 = [r for r in rows if r["offset_days"] == 0]
    assert day0 and all(r["n_active"] == r["cohort_size"] for r in day0)
    assert all(0 <= r["retention"] <= 1.0 for r in rows)
    # total cohort sizes == distinct users
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["cohort_size"] for r in day0) == n_users
