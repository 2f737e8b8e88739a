"""Symmetric-delete fuzzy join: exact recall vs brute force on real data,
typo-shape unit cases, and the no-nested-loop plan pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.operators.fuzzy import (
    deletion_keys,
    fuzzy_self_pairs,
)
from youtube_api_data_etl_automation_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_deletion_keys_shape(spark):
    r = spark.createDataFrame([("abc",)], "s string").select(
        deletion_keys("s").alias("k")
    ).first()
    assert sorted(r.k) == ["ab", "abc", "ac", "bc"]


def test_typo_shapes_all_found(spark):
    rows = [
        (1, "videoId"), (2, "videoid"),   # substitution (the reference's :155 bug shape)
        (3, "video_id"),                   # insertion vs 2
        (4, "videoI"),                     # deletion vs 1
        (5, "completely-else"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    pairs = {(r.id_a, r.id_b): r.dist for r in fuzzy_self_pairs(df, "id", "s").collect()}
    assert pairs.get((1, 2)) == 1
    assert pairs.get((2, 3)) == 1          # insertion of '_'
    assert pairs.get((1, 4)) == 1          # trailing deletion
    assert (1, 3) not in pairs             # distance 2: insertion + case
    assert all(5 not in k for k in pairs)


def test_recall_matches_brute_force_on_customer_names(spark):
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_self_pairs(cust, "c_custkey", "c_name").collect()
    }
    a = cust.select(F.col("c_custkey").alias("ia"), F.col("c_name").alias("na"))
    b = cust.select(F.col("c_custkey").alias("ib"), F.col("c_name").alias("nb"))
    brute = {
        (r.ia, r.ib)
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .filter(F.levenshtein("na", "nb") <= 1)
        .collect()
    }
    assert got == brute
    assert len(brute) > 0  # sequential customer names differ in one digit


def test_no_nested_loop_plan(spark):
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    plan = (
        fuzzy_self_pairs(cust, "c_custkey", "c_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hot_key_cap_bounds_candidates(spark):
    """One mass-duplicated short string must not explode the join when the
    cap is on; distinct strings' pairs survive the cap."""
    rows = [(i, "zz") for i in range(200)] + [(1000, "alpha"), (1001, "alphb")]
    df = spark.createDataFrame(rows, "id long, s string")
    capped = fuzzy_self_pairs(df, "id", "s", max_key_df=50)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (1000, 1001) in got          # real near-match survives
    assert not any(a < 200 and b < 200 for a, b in got)  # dup cluster dropped
    # The cap distributes as a broadcast anti-join.
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
