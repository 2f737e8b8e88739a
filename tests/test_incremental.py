"""Incremental-semantics tests (SURVEY.md §5 item 3): delta-only append,
idempotent re-run, empty-delta gate, dimension overwrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.operators.incremental import (
    append_delta,
    is_empty,
    overwrite_dim,
    select_new,
)


def _orders(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("videoId"), (F.col("id") * 2).alias("views"))


def test_select_new_is_anti_join(spark):
    cands = _orders(spark, 0, 100)
    existing = _orders(spark, 0, 60)
    new = select_new(cands, existing, "videoId")
    got = sorted(r.videoId for r in new.collect())
    assert got == list(range(60, 100))


def test_select_new_dedups_existing_side(spark):
    cands = _orders(spark, 0, 10)
    existing = _orders(spark, 5, 8).unionAll(_orders(spark, 5, 8))
    assert sorted(r.videoId for r in select_new(cands, existing, "videoId").collect()) == [
        0, 1, 2, 3, 4, 8, 9,
    ]


def test_empty_delta_gate(spark):
    cands = _orders(spark, 0, 50)
    assert is_empty(select_new(cands, cands, "videoId"))
    assert not is_empty(select_new(_orders(spark, 0, 51), cands, "videoId"))


def test_append_delta_idempotent(spark, tmp_path):
    sink = str(tmp_path / "sink")
    # The return value is the rows ACTUALLY written (what run_etl reports
    # as 'loaded') — on overlap/retry it is the post-filter delta, not the
    # incoming batch size.
    assert append_delta(_orders(spark, 0, 500), sink, "videoId") == 500
    assert spark.read.parquet(sink).count() == 500
    # overlapping second batch: only the delta lands
    assert append_delta(_orders(spark, 0, 800), sink, "videoId") == 300
    assert spark.read.parquet(sink).count() == 800
    # exact re-run: no-op (idempotent under at-least-once retries)
    assert append_delta(_orders(spark, 0, 800), sink, "videoId") == 0
    df = spark.read.parquet(sink)
    assert df.count() == 800
    assert df.groupBy("videoId").count().filter("count > 1").count() == 0


def test_overwrite_dim(spark, tmp_path):
    sink = str(tmp_path / "dim")
    overwrite_dim(_orders(spark, 0, 10), sink)
    overwrite_dim(_orders(spark, 100, 105), sink)
    got = sorted(r.videoId for r in spark.read.parquet(sink).collect())
    assert got == list(range(100, 105))


def test_merge_upsert(spark, tmp_path):
    from youtube_api_data_etl_automation_spark.operators.incremental import merge_upsert

    sink = str(tmp_path / "merge_sink")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, v long"
    )
    merge_upsert(base, sink, "k")
    # Update k=2, insert k=4; k=1/3 untouched.
    upd = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "k long, name string, v long"
    )
    merge_upsert(upd, sink, "k")
    got = {r["k"]: (r["name"], r["v"]) for r in spark.read.parquet(sink).collect()}
    assert got == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30), 4: ("d", 40)}
    # Idempotent re-merge of the same updates changes nothing.
    merge_upsert(upd, sink, "k")
    again = {r["k"]: (r["name"], r["v"]) for r in spark.read.parquet(sink).collect()}
    assert again == got


def test_sink_exists_probe(spark, tmp_path):
    """S5: the sink probe is a real FS existence check — false before any
    write, true after, and never confuses an empty dir for a table."""
    from youtube_api_data_etl_automation_spark.operators.incremental import sink_exists

    sink = str(tmp_path / "probe_sink")
    assert not sink_exists(spark, sink)
    append_delta(_orders(spark, 0, 5), sink, "videoId")
    assert sink_exists(spark, sink)


def test_jdbc_append_delta_idempotent(spark, tmp_path):
    """S6 over JDBC (the reference's actual sink is a database via to_sql
    append, fetch_youtube_data.py:194): same idempotent-append property as
    the parquet path, against embedded Derby."""
    from youtube_api_data_etl_automation_spark.operators.jdbc import (
        append_delta_jdbc,
        derby_url,
        jdbc_table_exists,
        read_dim_jdbc,
    )

    url = derby_url(str(tmp_path / "derby_db"))
    assert not jdbc_table_exists(spark, url, "video_stats")
    assert append_delta_jdbc(_orders(spark, 0, 100), url, "video_stats", "videoId") == 100
    assert jdbc_table_exists(spark, url, "video_stats")
    # overlapping second batch: only the delta lands
    assert append_delta_jdbc(_orders(spark, 0, 150), url, "video_stats", "videoId") == 50
    # exact re-run: no-op
    assert append_delta_jdbc(_orders(spark, 0, 150), url, "video_stats", "videoId") == 0
    back = read_dim_jdbc(spark, url, "video_stats")
    assert back.count() == 150
    assert back.groupBy("videoId").count().filter("count > 1").count() == 0


def test_jdbc_overwrite_dim(spark, tmp_path):
    """S7 over JDBC (to_sql replace, :198): full-replace semantics."""
    from youtube_api_data_etl_automation_spark.operators.jdbc import (
        derby_url,
        overwrite_dim_jdbc,
        read_dim_jdbc,
    )

    url = derby_url(str(tmp_path / "derby_dim"))
    overwrite_dim_jdbc(_orders(spark, 0, 10), url, "channel_stats")
    overwrite_dim_jdbc(_orders(spark, 100, 105), url, "channel_stats")
    got = sorted(r.videoId for r in read_dim_jdbc(spark, url, "channel_stats").collect())
    assert got == list(range(100, 105))


def test_incremental_agg_matches_full_recompute(spark, tmp_path):
    """Folding two delta batches into the aggregate state must equal the
    single-pass aggregate over their union — bit-identical (decimal sums),
    regardless of batch boundaries."""
    from youtube_api_data_etl_automation_spark.operators.incremental import (
        incremental_agg,
    )
    from youtube_api_data_etl_automation_spark.sources.tables import load_table

    from .conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    b1 = orders.filter(F.col("o_orderkey") % 3 != 0)
    b2 = orders.filter(F.col("o_orderkey") % 3 == 0)
    state_path = str(tmp_path / "agg_state")

    incremental_agg(b1, state_path, keys=["o_orderpriority"], sum_cols=["o_totalprice"])
    incremental_agg(b2, state_path, keys=["o_orderpriority"], sum_cols=["o_totalprice"])

    got = spark.read.parquet(state_path)
    want = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias("sum_o_totalprice"),
    )
    assert got.exceptAll(want).union(want.exceptAll(got)).count() == 0


def test_incremental_agg_new_keys_in_later_batch(spark, tmp_path):
    from youtube_api_data_etl_automation_spark.operators.incremental import (
        incremental_agg,
    )

    b1 = spark.createDataFrame([("x", 1.0), ("x", 2.0)], "k string, v double")
    b2 = spark.createDataFrame([("y", 5.0), ("x", 3.0)], "k string, v double")
    state_path = str(tmp_path / "s")
    incremental_agg(b1, state_path, keys=["k"], sum_cols=["v"])
    state = incremental_agg(b2, state_path, keys=["k"], sum_cols=["v"])
    rows = {r["k"]: (r["cnt"], float(r["sum_v"])) for r in state.collect()}
    assert rows == {"x": (3, 6.0), "y": (1, 5.0)}


def test_incremental_agg_batch_id_makes_retry_a_noop(spark, tmp_path):
    from youtube_api_data_etl_automation_spark.operators.incremental import (
        incremental_agg,
    )

    b1 = spark.createDataFrame([("x", 1.0), ("x", 2.0)], "k string, v double")
    state_path = str(tmp_path / "s")
    incremental_agg(b1, state_path, keys=["k"], sum_cols=["v"], batch_id="b1")
    # Retry of the same batch: state unchanged.
    state = incremental_agg(b1, state_path, keys=["k"], sum_cols=["v"], batch_id="b1")
    rows = {r["k"]: (r["cnt"], float(r["sum_v"])) for r in state.collect()}
    assert rows == {"x": (2, 3.0)}
    # A new batch id still folds.
    state = incremental_agg(b1, state_path, keys=["k"], sum_cols=["v"], batch_id="b2")
    rows = {r["k"]: (r["cnt"], float(r["sum_v"])) for r in state.collect()}
    assert rows == {"x": (4, 6.0)}


def test_null_key_append_stays_idempotent(spark, tmp_path):
    """r6: the anti-join key match is NULL-safe, so a NULL-key row appends
    once and a retry of the same delta appends nothing — previously the
    NULL = NULL comparison never matched and every retry duplicated it."""
    from youtube_api_data_etl_automation_spark.operators.incremental import (
        append_delta,
    )

    sink = str(tmp_path / "null_sink")
    delta = spark.createDataFrame([("k1", 1), (None, 2)], "key string, v int")
    assert append_delta(delta, sink, "key") == 2
    # retry of the identical delta: both keys (incl. NULL) already present
    assert append_delta(delta, sink, "key") == 0
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 2


def test_merge_upsert_null_key_replaces_not_accumulates(spark, tmp_path):
    from youtube_api_data_etl_automation_spark.operators.incremental import (
        merge_upsert,
    )

    sink = str(tmp_path / "null_dim")
    merge_upsert(
        spark.createDataFrame([("a", 1), (None, 10)], "key string, v int"),
        sink,
        "key",
    )
    for v in (20, 30):
        merge_upsert(
            spark.createDataFrame([(None, v)], "key string, v int"), sink, "key"
        )
    got = {(r.key, r.v) for r in spark.read.parquet(sink).collect()}
    assert got == {("a", 1), (None, 30)}  # replaced, not accumulated


def test_merge_upsert_recovers_stranded_stage(spark, tmp_path):
    """r6 staged overwrite: a crash between the sink delete and the stage
    rename leaves the complete stage on disk; the next call promotes it
    instead of treating the sink as first-run."""
    import shutil

    from youtube_api_data_etl_automation_spark.operators.incremental import (
        _stage_path,
        merge_upsert,
    )

    sink = str(tmp_path / "dim")
    merge_upsert(
        spark.createDataFrame([("a", 1), ("b", 2)], "key string, v int"),
        sink,
        "key",
    )
    # Simulate the crash window: full new state sits in the stage, sink gone.
    spark.createDataFrame(
        [("a", 9), ("b", 2)], "key string, v int"
    ).write.parquet(_stage_path(sink))
    shutil.rmtree(sink)
    merge_upsert(
        spark.createDataFrame([("c", 3)], "key string, v int"), sink, "key"
    )
    got = {(r.key, r.v) for r in spark.read.parquet(sink).collect()}
    assert got == {("a", 9), ("b", 2), ("c", 3)}  # staged state recovered


def test_stale_sidecar_voided_by_batchless_rebuild(spark, tmp_path):
    """r6: rebuilding a deleted state WITHOUT a batch_id must still void
    the applied-batch sidecar, else later replays of previously-applied
    ids are silently skipped against the rebuilt state."""
    import shutil

    from youtube_api_data_etl_automation_spark.operators.incremental import (
        incremental_agg,
    )

    state = str(tmp_path / "agg_state")
    b1 = spark.createDataFrame([("k", 1.0)], "g string, x double")
    incremental_agg(b1, state, ["g"], ["x"], batch_id="b1")
    shutil.rmtree(state)
    # rebuild WITHOUT a batch id — previously left the sidecar in place
    incremental_agg(b1, state, ["g"], ["x"], batch_id=None)
    # replay of 'b1' must fold (the sidecar was voided), not be skipped
    incremental_agg(b1, state, ["g"], ["x"], batch_id="b1")
    [row] = spark.read.parquet(state).collect()
    assert row.cnt == 2 and float(row.sum_x) == 2.0
