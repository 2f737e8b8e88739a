"""Per-group capping (operators/capping.py): equality with the naive
whole-corpus rank, content-stability, and the under-cap fast path."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.operators.capping import cap_per_group
from youtube_api_data_etl_automation_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _naive(df, group_col, id_col, cap, salt="cap:"):
    rank_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def test_matches_naive_rank_form(spark):
    docs = load_table(spark, SF, "documents")
    fast = cap_per_group(docs, group_col="lang", id_col="doc_id", cap=10)
    naive = _naive(docs, "lang", "doc_id", 10)
    assert fast.exceptAll(naive).union(naive.exceptAll(fast)).count() == 0


def test_under_cap_groups_pass_complete(spark):
    docs = load_table(spark, SF, "documents")
    counts = dict(docs.groupBy("lang").count().collect())
    cap = max(counts.values()) - 1  # only the largest group is over
    kept = cap_per_group(docs, group_col="lang", id_col="doc_id", cap=cap)
    kept_counts = dict(kept.groupBy("lang").count().collect())
    for lang, n in counts.items():
        assert kept_counts[lang] == min(n, cap)


def test_cap_of_zero_group_sizes(spark):
    docs = load_table(spark, SF, "documents")
    kept = cap_per_group(docs, group_col="lang", id_col="doc_id", cap=1)
    sizes = [r["count"] for r in kept.groupBy("lang").count().collect()]
    assert all(s == 1 for s in sizes)


def test_null_group_is_capped_like_any_other(spark):
    """NULL group keys must NOT bypass the cap: the window form treats NULL
    as one partition, so the two-path form must route NULL-keyed rows into
    the capped path too (null-safe joins)."""
    docs = load_table(spark, SF, "documents")
    nulled = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, None).otherwise(F.col("lang"))
    )
    fast = cap_per_group(nulled, group_col="lang", id_col="doc_id", cap=5)
    naive = _naive(nulled, "lang", "doc_id", 5)
    assert fast.exceptAll(naive).union(naive.exceptAll(fast)).count() == 0
    n_null = fast.filter(F.col("lang").isNull()).count()
    assert n_null == 5  # ~167 NULL rows at sf0.001 → capped to exactly 5


def test_selection_is_content_stable_under_growth(spark):
    """A row kept at cap N stays kept when the corpus is SHUFFLED or rows
    of other groups are added — its fate depends only on its own group's
    hash order."""
    docs = load_table(spark, SF, "documents")
    kept1 = set(
        r["doc_id"]
        for r in cap_per_group(
            docs.repartition(3), group_col="lang", id_col="doc_id", cap=10
        ).select("doc_id").collect()
    )
    kept2 = set(
        r["doc_id"]
        for r in cap_per_group(
            docs.repartition(11), group_col="lang", id_col="doc_id", cap=10
        ).select("doc_id").collect()
    )
    assert kept1 == kept2
    # Adding docs of a NEW group never evicts existing keeps.
    extra = spark.createDataFrame(
        [(10_000 + i, "txt", "xx", "srcX", 3) for i in range(50)], docs.schema
    )
    grown = docs.unionByName(extra)
    kept3 = set(
        r["doc_id"]
        for r in cap_per_group(
            grown, group_col="lang", id_col="doc_id", cap=10
        ).select("doc_id").collect()
        if r["doc_id"] < 10_000
    )
    assert kept1 == kept3
