"""CLI entry point: parser wiring + a hermetic fake-transport ETL run."""

from __future__ import annotations

import json
import tempfile

import pytest

from youtube_api_data_etl_automation_spark.__main__ import build_parser, main


def test_parser_requires_subcommand():
    with pytest.raises(SystemExit):
        build_parser().parse_args([])


def test_parser_etl_defaults():
    args = build_parser().parse_args(
        ["etl", "--channels", "a,b", "--warehouse", "/tmp/x"]
    )
    assert args.transport == "https" and args.seed == 42
    assert args.fn is not None


def test_parser_curate_lang_rates():
    args = build_parser().parse_args(
        ["curate", "--input", "i", "--output", "o", "--lang-rates", "en=128,fr=64"]
    )
    assert args.lang_rates == "en=128,fr=64"


def test_parser_curate_dsir_pair_required_together():
    args = build_parser().parse_args(
        ["curate", "--input", "i", "--output", "o",
         "--dsir-target", "t.parquet", "--dsir-keep", "5"]
    )
    assert args.dsir_target == "t.parquet" and args.dsir_keep == 5
    # half a pair is a usage error BEFORE any Spark session spins up
    half = build_parser().parse_args(
        ["curate", "--input", "i", "--output", "o", "--dsir-keep", "5"]
    )
    assert half.fn(half) == 2


def test_parser_drift_versions():
    args = build_parser().parse_args(
        ["drift", "--sink", "/tmp/s", "--versions", "3:5",
         "--null-rate-jump", "0.1", "--psi", "v:0:10:20"]
    )
    assert args.versions == (3, 5) and args.null_rate_jump == 0.1
    assert args.psi == ("v", 0.0, 10.0, 20)
    # malformed specs are clean usage errors, not tracebacks after a
    # Spark session already spun up
    # ... and so are SEMANTICALLY invalid specs (hi<=lo, bins<=0,
    # prev==cur), which used to parse fine and die later as ValueError
    # tracebacks once the Spark session had already spun up
    for bad in (["--versions", "3"], ["--versions", "a:b"],
                ["--versions", "3:3"],
                ["--psi", "v:0:10"], ["--psi", "v:0:ten:4"],
                ["--psi", "v:10:0:5"], ["--psi", "v:5:5:5"],
                ["--psi", "v:0:10:0"], ["--psi", "v:0:10:-3"]):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["drift", "--sink", "/tmp/s"] + bad)


def test_drift_cli_end_to_end(spark, capsys):
    """Two committed versions with a planted null spike: exit code 2 and
    the flagged metric in the JSON line; a clean pair exits 0."""
    from pyspark.sql import functions as F

    from youtube_api_data_etl_automation_spark.operators.versioned import (
        commit_version,
    )

    base = tempfile.mkdtemp(prefix="cli_drift_") + "/sink"
    df = spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(20)], "k string, v double"
    )
    commit_version(df, base, keep_versions=3)
    commit_version(df, base, keep_versions=3)  # identical refresh: clean
    rc = main(["drift", "--sink", base])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok" and out["flagged"] == []
    commit_version(
        df.withColumn("k", F.when(F.col("v") < 10, F.col("k"))), base,
        keep_versions=3,
    )
    rc = main(["drift", "--sink", base])
    assert rc == 2
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "drift"
    assert (out["prev_version"], out["cur_version"]) == (2, 3)
    assert {(f["column"], f["metric"]) for f in out["flagged"]} == {
        ("k", "null_rate")
    }


def test_drift_cli_psi_flag(spark, capsys):
    """--psi COL:LO:HI:BINS rides the same run: a same-mean spread
    explosion flags ONLY through psi (exit 2, psi object in the JSON)."""
    from youtube_api_data_etl_automation_spark.operators.versioned import (
        commit_version,
    )

    def vdf(vals):
        return spark.createDataFrame(
            [(f"k{i}", float(v)) for i, v in enumerate(vals)],
            "k string, v double",
        )

    base = tempfile.mkdtemp(prefix="cli_psi_") + "/sink"
    commit_version(vdf([5.0] * 40 + [4.0] * 30 + [6.0] * 30), base)
    commit_version(vdf([5.0] * 20 + [1.0] * 40 + [9.0] * 40), base)
    rc = main(["drift", "--sink", base, "--psi", "v:0:10:10"])
    assert rc == 2
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "drift"
    assert out["psi"]["flagged"] is True and out["psi"]["psi"] > 0.25
    # moment metrics alone were quiet: the psi entry is the only flag,
    # and it carries the SAME key shape as moment-drift entries so
    # consumers can index flagged[i]['delta'] regardless of metric
    assert [f["metric"] for f in out["flagged"]] == ["psi"]
    entry = out["flagged"][0]
    assert {"column", "metric", "prev", "cur", "delta"} <= set(entry)
    assert entry["delta"] == out["psi"]["psi"]
    assert entry["prev"] == 100 and entry["cur"] == 100


def test_profile_cli_end_to_end(spark, capsys):
    """profile subcommand: stats + histogram + top-k + contract checks in
    one JSON line; a failed check exits 2, a clean contract exits 0."""
    d = tempfile.mkdtemp(prefix="cli_profile_")
    path = d + "/t.parquet"
    spark.createDataFrame(
        [(i, float(i), "x" if i % 2 else "y") for i in range(10)]
        + [(3, None, None)],  # dup key + nulls
        "k long, v double, s string",
    ).write.parquet(path)
    rc = main([
        "profile", "--input", path, "--hist", "v:0:10:5", "--topk", "s",
        "--not-null", "k", "--unique", "k", "--satisfies", "v >= k",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and out["status"] == "check_failed"
    assert out["n_rows"] == 11
    assert out["failed_checks"] == ["unique(k)"]
    sections = {r["section"] for r in out["profile"]}
    assert sections == {"stats", "checks", "hist", "topk"}
    stats = {r["column_name"]: r for r in out["profile"]
             if r["section"] == "stats"}
    assert stats["v"]["n_nulls"] == 1 and stats["k"]["n_distinct"] == 10
    rc = main(["profile", "--input", path, "--not-null", "k"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["status"] == "ok" and out["failed_checks"] == []


def test_drift_cli_breaking_schema_change_exits_2(spark, capsys):
    """A dropped column is invisible to value drift (profile_drift diffs
    only shared columns) but IS a breaking schema change: the CLI must
    report it under schema_changes and exit 2 even with every value
    metric quiet; a non-breaking added column alone stays exit 0."""
    from youtube_api_data_etl_automation_spark.operators.versioned import (
        commit_version,
    )

    base = tempfile.mkdtemp(prefix="cli_schema_") + "/sink"
    rows = [(f"k{i}", float(i), i) for i in range(20)]
    commit_version(
        spark.createDataFrame(rows, "k string, v double, w long"), base,
        keep_versions=4,
    )
    # v2 drops w: values of k/v identical => only the schema flags
    commit_version(
        spark.createDataFrame(
            [(k, v) for k, v, _ in rows], "k string, v double"
        ),
        base,
        keep_versions=4,
    )
    rc = main(["drift", "--sink", base])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and out["status"] == "drift"
    assert out["flagged"] == []  # no value metric saw anything
    assert out["schema_changes"] == [
        {"column": "w", "change": "dropped", "prev_type": "bigint",
         "cur_type": None, "breaking": True}
    ]
    # v3 adds a column back (non-breaking): clean exit, change reported
    commit_version(
        spark.createDataFrame(
            [(k, v, True) for k, v, _ in rows],
            "k string, v double, extra boolean",
        ),
        base,
        keep_versions=4,
    )
    rc = main(["drift", "--sink", base])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["status"] == "ok"
    assert out["schema_changes"] == [
        {"column": "extra", "change": "added", "prev_type": None,
         "cur_type": "boolean", "breaking": False}
    ]


def test_etl_fake_transport_end_to_end(spark, capsys):
    # main() builds its own session via get_spark(); under pytest that
    # returns the active session, so no second JVM spins up.
    wh = tempfile.mkdtemp(prefix="cli_wh_")
    rc = main(
        [
            "etl",
            "--channels",
            "CH1,CH2",
            "--warehouse",
            wh,
            "--transport",
            "fake",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok"
    assert out["channels"] == 2
    assert out["loaded"] == out["new_videos"] > 0
    # Idempotent re-run: nothing new to load.
    rc = main(
        ["etl", "--channels", "CH1,CH2", "--warehouse", wh, "--transport", "fake"]
    )
    assert rc == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["new_videos"] == 0


def test_ingest_cli_end_to_end(spark, capsys, tmp_path):
    """Two `ingest` runs against one sink: the first commits the seed
    batch (exit 0), the second — an exact replay — commits nothing and
    exits 3 (the cron-visible 'fully stale feed' signal), with the
    verdict counts in the JSON line."""
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "totally different second document text")],
        "doc_id long, text string",
    )
    inp = str(tmp_path / "batch1")
    b1.write.parquet(inp)
    sink = str(tmp_path / "sink")

    rc = main(["ingest", "--input", inp, "--sink", sink])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["n_committed"] == 2 and out["version"] == 1

    rc = main(["ingest", "--input", inp, "--sink", sink])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 3
    assert out["n_committed"] == 0 and out["n_exact_dup"] == 2
    assert out["version"] == 1


def test_shards_cli_certifies_and_flags_broken(spark, capsys, tmp_path):
    """`shards` exits 0 on a healthy write_training_shards sink and 2
    with the broken shard named after a mid-shard hole is planted."""
    from pyspark.sql import functions as F

    from youtube_api_data_etl_automation_spark.corpus import (
        curate_corpus,
        write_training_shards,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and runs to the hills "
        "while a calm wind blows over the quiet town in the early morning"
    )
    docs = spark.createDataFrame(
        [(i, f"{good} tail{i}") for i in range(30)], "doc_id long, text string"
    )
    out = curate_corpus(docs, n_shards=3, audit=False)
    path = str(tmp_path / "shards")
    write_training_shards(out["documents"], path)

    rc = main(["shards", "--input", path])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["status"] == "ok" and rep["broken_shards"] == []
    assert rep["n_shards"] == 3

    back = spark.read.parquet(path)
    s0 = back.filter("shard = 0").orderBy("token_start").collect()
    assert len(s0) >= 3
    holed = str(tmp_path / "holed")
    back.filter(
        ~((F.col("shard") == 0) & (F.col("token_start") == s0[1]["token_start"]))
    ).write.partitionBy("shard").mode("overwrite").parquet(holed)
    rc = main(["shards", "--input", holed])
    assert rc == 2
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["status"] == "broken_shards" and rep["broken_shards"] == [0]


def test_profile_cli_state_mode_folds_and_gates(spark, capsys):
    """profile --state-dir: batch 1 seeds the state, a clean batch 2 folds
    (exit 0, cumulative rows grow), a drifted batch with --gate-drift is
    NOT folded (exit 2, state unchanged), and a replayed batch id folds
    nothing."""
    d = tempfile.mkdtemp(prefix="cli_profile_state_")
    state = d + "/state"

    def write(path, rows):
        spark.createDataFrame(rows, "k long, v double").write.parquet(path)

    write(d + "/b1.parquet", [(i, float(i % 7)) for i in range(50)])
    write(d + "/b2.parquet", [(50 + i, float(i % 7)) for i in range(50)])
    write(d + "/bad.parquet", [(100 + i, None) for i in range(50)])

    # drift-check the STATIONARY column only (k is a monotone id whose
    # mean shifts across batches by construction — the operator docstring
    # says not to drift-check those)
    rc = main(["profile", "--input", d + "/b1.parquet", "--columns", "v",
               "--state-dir", state, "--batch-id", "b1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["status"] == "ok" and out["folded"]
    assert {r["column_name"]: r["n_rows"] for r in out["cumulative_profile"]} \
        == {"v": 50}

    rc = main(["profile", "--input", d + "/b2.parquet", "--columns", "v",
               "--state-dir", state, "--batch-id", "b2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["cumulative_profile"][0]["n_rows"] == 100

    rc = main(["profile", "--input", d + "/bad.parquet", "--columns", "v",
               "--state-dir", state, "--batch-id", "b3", "--gate-drift"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and out["status"] == "drift_flagged" and not out["folded"]
    assert any(f["metric"] == "null_rate" for f in out["drift_flags"])
    assert out["cumulative_profile"][0]["n_rows"] == 100  # state untouched

    # replayed id: exit 0, nothing double-folds
    rc = main(["profile", "--input", d + "/b2.parquet", "--columns", "v",
               "--state-dir", state, "--batch-id", "b2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["cumulative_profile"][0]["n_rows"] == 100

    # --state-dir without --batch-id is a usage error
    rc = main(["profile", "--input", d + "/b1.parquet", "--state-dir", state])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["status"] == "error"


def test_profile_cli_state_mode_hist_psi_gate(spark, capsys):
    """profile --state-dir --hist: the shape gate — a batch whose moments
    are quiet but whose distribution collapsed into one bucket flags PSI
    and is quarantined under --gate-drift."""
    d = tempfile.mkdtemp(prefix="cli_profile_hist_")
    state = d + "/state"
    spark.createDataFrame(
        [(i, float(i % 10)) for i in range(100)], "k long, v double"
    ).write.parquet(d + "/b1.parquet")
    # same mean (4.5), same null rate (0), completely different shape
    spark.createDataFrame(
        [(100 + i, 4.5) for i in range(100)], "k long, v double"
    ).write.parquet(d + "/peaked.parquet")

    rc = main(["profile", "--input", d + "/b1.parquet", "--columns", "v",
               "--state-dir", state, "--batch-id", "b1",
               "--hist", "v:0:10:10"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["folded"]

    rc = main(["profile", "--input", d + "/peaked.parquet", "--columns", "v",
               "--state-dir", state, "--batch-id", "b2",
               "--hist", "v:0:10:10", "--gate-drift"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and not out["folded"]
    assert [f["metric"] for f in out["drift_flags"]] == ["psi"]

    # folding without --hist on a shape-tracking sink: the operator's
    # drop-protection ValueError surfaces through the CLI's JSON error
    # contract (exit 1), never a traceback
    rc = main(["profile", "--input", d + "/b1.parquet", "--columns", "v",
               "--state-dir", state, "--batch-id", "b3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["status"] == "error"
    assert "hist" in out["error"]

    # --hist retargeted to a column the committed state doesn't track:
    # KeyError from the shape gate also honors the JSON contract
    rc = main(["profile", "--input", d + "/b1.parquet", "--columns", "v",
               "--state-dir", state, "--batch-id", "b4",
               "--hist", "k:0:200:10"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["status"] == "error"
    assert "k" in out["error"]


def test_profile_cli_report_mode_reads_committed_state(spark, capsys):
    """profile --state-dir --report: the dashboard read — cumulative
    stats + quantiles + heavy-hitter bounds straight off the committed
    state, no --input, no fold."""
    d = tempfile.mkdtemp(prefix="cli_profile_report_")
    state = d + "/state"
    spark.createDataFrame(
        [(i, float(i % 10), f"v{i % 3}") for i in range(100)],
        "k long, v double, s string",
    ).write.parquet(d + "/b1.parquet")

    rc = main(["profile", "--input", d + "/b1.parquet",
               "--columns", "v,s", "--state-dir", state, "--batch-id", "b1",
               "--hist", "v:0:10:10", "--track-topk", "s:5"])
    assert rc == 0
    capsys.readouterr()

    rc = main(["profile", "--state-dir", state, "--report", "--k", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["status"] == "ok"
    assert {r["column_name"] for r in out["cumulative_profile"]} == {"v", "s"}
    assert "0.5" in out["quantiles"]["v"]
    top = out["top_values"]["s"]
    assert len(top) == 2 and top[0]["exact"] is True
    # usage errors stay pre-Spark-friendly JSON
    rc = main(["profile", "--report"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["status"] == "error"
    rc = main(["profile"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["status"] == "error"


def test_events_cli_funnel_and_retention(spark, capsys):
    """events subcommand: funnel + retention as one JSON line."""
    d = tempfile.mkdtemp(prefix="cli_events_")
    path = d + "/ev.parquet"
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, "signup", t0), (1, "click", t0 + datetime.timedelta(seconds=5)),
        (2, "signup", t0), (3, "click", t0),
        (1, "click", t0 + datetime.timedelta(days=1)),
    ]
    spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    rc = main(["events", "--input", path, "--steps", "signup,click",
               "--retention"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["status"] == "ok"
    assert [(r["step"], r["n_users"]) for r in out["funnel"]] == [
        (1, 2), (2, 1)
    ]
    assert any(r["offset_days"] == 1 for r in out["retention"])
    # bad steps: usage error before a session matters
    rc = main(["events", "--input", path, "--steps", "a,a"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["status"] == "error"


def test_events_cli_state_mode_folds_and_reports(spark, capsys):
    """events --state-dir (r9): batch 1 seeds the funnel/retention state,
    batch 2 folds (rollup off the state == batch over the union), a
    replayed batch id folds nothing, and --report reads with no input."""
    import datetime

    d = tempfile.mkdtemp(prefix="cli_events_state_")
    state = d + "/state"
    t0 = datetime.datetime(2024, 1, 1)

    def write(path, rows):
        spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp_ntz"
        ).write.parquet(path)

    write(d + "/b1.parquet", [
        (1, "signup", t0), (2, "signup", t0),
        (1, "click", t0 + datetime.timedelta(seconds=5)),
    ])
    write(d + "/b2.parquet", [
        (2, "click", t0 + datetime.timedelta(days=1)),
        (3, "signup", t0 + datetime.timedelta(days=1)),
    ])

    base = ["events", "--steps", "signup,click", "--retention",
            "--state-dir", state]
    rc = main(base + ["--input", d + "/b1.parquet", "--batch-id", "b1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["folded"]
    assert [(r["step"], r["n_users"]) for r in out["funnel"]] == [
        (1, 2), (2, 1)
    ]

    rc = main(base + ["--input", d + "/b2.parquet", "--batch-id", "b2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert [(r["step"], r["n_users"]) for r in out["funnel"]] == [
        (1, 3), (2, 2)
    ]
    assert any(r["offset_days"] == 1 for r in out["retention"])

    # replayed id: markers skip the fold, numbers unchanged
    rc = main(base + ["--input", d + "/b1.parquet", "--batch-id", "b1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [(r["step"], r["n_users"]) for r in out["funnel"]] == [
        (1, 3), (2, 2)
    ]

    # pure report: no input, same numbers
    rc = main(base + ["--report"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and not out["folded"]
    assert [(r["step"], r["n_users"]) for r in out["funnel"]] == [
        (1, 3), (2, 2)
    ]

    # missing batch id / missing state are JSON errors
    rc = main(base + ["--input", d + "/b1.parquet"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["status"] == "error"
    rc = main(["events", "--steps", "signup,click",
               "--state-dir", d + "/none", "--report"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and "no committed funnel state" in out["error"]


def test_ivf_cli_full_maintenance_cycle(spark, capsys):
    """ivf subcommand (r9): init trains and commits v1, report is a gate
    (exit 2 when a cell leaves the band), append folds a batch at
    O(delta), rebalance compacts and restores the band, gc reports."""
    d = tempfile.mkdtemp(prefix="cli_ivf_")
    base = d + "/index"

    def vec(b, j):
        v = [0.0] * 4
        v[b] = 1.0
        v[(b + 1) % 4] = 0.01 * (j % 5)
        return v

    spark.createDataFrame(
        [(b + 4 * j, vec(b, j)) for b in range(4) for j in range(20)],
        "vec_id long, embedding array<float>",
    ).write.parquet(d + "/corpus.parquet")
    spark.createDataFrame(
        [(1000 + j, vec(0, j)) for j in range(50)],
        "vec_id long, embedding array<float>",
    ).write.parquet(d + "/batch.parquet")

    rc = main(["ivf", "--base", base, "--init",
               "--input", d + "/corpus.parquet", "--k", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["version"] == 1

    rc = main(["ivf", "--base", base, "--target-cell-size", "20"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["status"] == "ok" and len(out["cells"]) == 4

    rc = main(["ivf", "--base", base, "--append",
               "--input", d + "/batch.parquet"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["version"] == 2

    rc = main(["ivf", "--base", base, "--target-cell-size", "20"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and out["status"] == "flagged"
    assert out["flagged_cells"] == [0] and out["n_dirs"] == 2

    rc = main(["ivf", "--base", base, "--rebalance",
               "--target-cell-size", "20"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["k"] == 7 and out["n_vectors"] == 130

    rc = main(["ivf", "--base", base, "--target-cell-size", "20"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc in (0, 2) and len(out["cells"]) == 7

    rc = main(["ivf", "--base", base, "--gc"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["deleted"] == []  # age guard: nothing yet

    # usage / missing-index errors follow the JSON contract
    rc = main(["ivf", "--base", d + "/none"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["status"] == "error"
    rc = main(["ivf", "--base", base, "--rebalance"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and "target-cell-size" in out["error"]


def test_media_cli_triage_and_tags(spark, capsys):
    """r10 media subcommand: triage over a mixed payload parquet exits 2
    (quarantined payloads present) with the route breakdown; a
    clean-only input exits 0; tags mode reads the tag containers."""
    import sys

    sys.path.insert(0, "tests")
    from test_operators import _png

    base = tempfile.mkdtemp(prefix="cli_media_")
    good = _png([[(10, 20, 30)] * 3] * 2)
    spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"\x00junk"))],
        "doc_id long, payload binary",
    ).write.mode("overwrite").parquet(base + "/mixed")
    rc = main(["media", "--input", base + "/mixed", "--op", "triage",
               "--output", base + "/out"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2
    assert out["status"] == "quarantined_payloads"
    assert out["by_route"] == {"decoded": 1, "probe_failed": 1}
    assert spark.read.parquet(base + "/out").count() == 2

    spark.createDataFrame(
        [(1, bytearray(good))], "doc_id long, payload binary"
    ).write.mode("overwrite").parquet(base + "/clean")
    rc = main(["media", "--input", base + "/clean", "--op", "decode"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["status"] == "ok"
    assert out["by_format"] == {"png": 1}

    from test_mediameta import _flac_with_comments

    spark.createDataFrame(
        [(1, bytearray(_flac_with_comments(["TITLE=T", "ARTIST=A"])))],
        "doc_id long, payload binary",
    ).write.mode("overwrite").parquet(base + "/tagged")
    rc = main(["media", "--input", base + "/tagged", "--op", "tags"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["by_container"] == {"flac": 1}

    # unusable input is a clean error, not a traceback
    rc = main(["media", "--input", base + "/missing", "--op", "probe"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["status"] == "error"


def test_media_cli_r11_ops(spark, capsys):
    """r11 media ops: audiotriage routes, keyframe decodes AVI/MJPEG,
    subband reads Layer I essence."""
    import sys

    sys.path.insert(0, "tests")
    from test_mediameta import _mjpeg_avi
    from test_mpegaudio import _ALLOC_MIX, _frame_l1, _sine_groups
    from test_operators import _wav

    base = tempfile.mkdtemp(prefix="cli_media11_")
    l1, _ = _frame_l1(_sine_groups(12, 1, _ALLOC_MIX, seed=41),
                      alloc_bands=_ALLOC_MIX)
    wav = _wav(8000, [(100,)] * 16)
    spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(l1))],
        "doc_id long, payload binary",
    ).write.mode("overwrite").parquet(base + "/audio")
    rc = main(["media", "--input", base + "/audio",
               "--op", "audiotriage"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["by_route"] == {"decoded": 1, "subband": 1}

    rc = main(["media", "--input", base + "/audio", "--op", "subband"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2  # the WAV quarantines on the Layer-I-only op
    assert out["by_format"] == {"mp3-layer1": 1, "None": 1}

    avi, _ = _mjpeg_avi()
    spark.createDataFrame(
        [(1, bytearray(avi))], "doc_id long, payload binary",
    ).write.mode("overwrite").parquet(base + "/video")
    rc = main(["media", "--input", base + "/video", "--op", "keyframe"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the summary groups by the first matching column — 'format' (the
    # decoded essence) precedes 'container' in the keyframe schema
    assert rc == 0 and out["by_format"] == {"jpeg": 1}


def test_media_cli_archive_and_warc(spark, capsys):
    import sys

    sys.path.insert(0, "tests")
    from test_archives import _warc, _zip

    base = tempfile.mkdtemp(prefix="cli_arch_")
    warc_payload, _ = _warc(per_record_gzip=True)
    spark.createDataFrame(
        [(1, bytearray(_zip())), (2, bytearray(warc_payload))],
        "doc_id long, payload binary",
    ).write.mode("overwrite").parquet(base + "/archives")
    rc = main(["media", "--input", base + "/archives",
               "--op", "archive"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["by_format"] == {"warc": 1, "zip": 1}

    rc = main(["media", "--input", base + "/archives", "--op", "warc"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2  # the zip payload quarantines on the WARC op
    assert out["n"] == 4  # 3 records + 1 quarantine row


def test_media_cli_pdfimages_r12(spark, capsys):
    """r12: pdfimages extracts image XObjects, grouped by format in
    the CLI summary."""
    import sys
    import zlib

    sys.path.insert(0, "tests")
    from test_pdf_images import img_obj, pdf_with_images, rgb_pixels

    base = tempfile.mkdtemp(prefix="cli_media12_")
    px = rgb_pixels(4, 3, seed=31)
    doc = pdf_with_images([
        (b"Raw", img_obj(
            b"/Width 4 /Height 3 /ColorSpace /DeviceRGB "
            b"/BitsPerComponent 8 /Filter /FlateDecode ",
            zlib.compress(px.tobytes()))),
        (b"Jpx", img_obj(b"/Width 2 /Height 2 /Filter /JPXDecode ",
                         b"\x00")),
    ])
    spark.createDataFrame(
        [(1, bytearray(doc))], "doc_id long, payload binary",
    ).write.mode("overwrite").parquet(base + "/pdfs")
    rc = main(["media", "--input", base + "/pdfs", "--op", "pdfimages"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2  # the JPX image quarantines
    assert out["by_format"] == {"ppm": 1, "None": 1}


def test_media_cli_sniff_r12(spark, capsys):
    base = tempfile.mkdtemp(prefix="cli_sniff_")
    spark.createDataFrame(
        [(1, bytearray(b"%PDF-1.4\n")), (2, bytearray(b"PK\x03\x04" + b"\x00" * 8)),
         (3, bytearray(b"garbage"))],
        "doc_id long, payload binary",
    ).write.mode("overwrite").parquet(base + "/mixed")
    rc = main(["media", "--input", base + "/mixed", "--op", "sniff"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["by_sniff_family"] == {"document": 1, "archive": 1,
                                      "unknown": 1}


def test_parser_curate_robots_psl_flags():
    """r13: crawl-compliance flags parse; --psl-file without
    --domain-cap is a usage error before any Spark session."""
    args = build_parser().parse_args(
        ["curate", "--input", "i", "--output", "o",
         "--robots", "r.parquet", "--robots-agent", "trainingbot",
         "--domain-cap", "100", "--psl-file", "psl.dat",
         "--url-col", "uri"]
    )
    assert args.robots == "r.parquet"
    assert args.robots_agent == "trainingbot"
    assert args.domain_cap == 100 and args.psl_file == "psl.dat"
    assert args.url_col == "uri"
    half = build_parser().parse_args(
        ["curate", "--input", "i", "--output", "o",
         "--psl-file", "psl.dat"]
    )
    assert half.fn(half) == 2


def test_frontier_command_end_to_end(spark, tmp_path):
    """r13: the frontier subcommand composes robots captures + sitemap
    fetches into a REP-filtered canonical seed list on disk."""
    robots_dir = str(tmp_path / "robots")
    sm_dir = str(tmp_path / "sitemaps")
    seen_dir = str(tmp_path / "seen")
    out_dir = str(tmp_path / "frontier")
    spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\n"
          "Sitemap: https://a.com/sm.xml\n")],
        "host string, payload string").write.parquet(robots_dir)
    spark.createDataFrame(
        [("https://a.com/sm.xml",
          "<urlset><url><loc>https://a.com/p1?utm_source=x</loc></url>"
          "<url><loc>https://a.com/p2</loc></url>"
          "<url><loc>https://a.com/private/x</loc></url></urlset>")],
        "url string, payload string").write.parquet(sm_dir)
    spark.createDataFrame([("https://a.com/p2",)], "url string") \
        .write.parquet(seen_dir)

    rc = main(["frontier", "--robots", robots_dir, "--sitemaps",
               sm_dir, "--seen", seen_dir, "--output", out_dir])
    assert rc == 0
    rows = spark.read.parquet(out_dir).collect()
    assert [(r["host"], r["url"]) for r in rows] == [
        ("a.com", "https://a.com/p1")]
    # exactly one of --robots/--warc is a parse-time usage error
    bad = build_parser().parse_args(
        ["frontier", "--sitemaps", sm_dir, "--output", out_dir])
    assert bad.fn(bad) == 2


def test_frontier_command_schedule(spark, tmp_path):
    """r14: --schedule-slots emits the politeness-aware fetch plan
    (slot/seq/not_before_sec honoring Crawl-delay)."""
    robots_dir = str(tmp_path / "robots")
    sm_dir = str(tmp_path / "sitemaps")
    out_dir = str(tmp_path / "plan")
    spark.createDataFrame(
        [("a.com", "User-agent: *\nCrawl-delay: 3\n"
          "Sitemap: https://a.com/sm.xml\n")],
        "host string, payload string").write.parquet(robots_dir)
    spark.createDataFrame(
        [("https://a.com/sm.xml",
          "<urlset><url><loc>https://a.com/p1</loc></url>"
          "<url><loc>https://a.com/p2</loc></url></urlset>")],
        "url string, payload string").write.parquet(sm_dir)

    rc = main(["frontier", "--robots", robots_dir, "--sitemaps",
               sm_dir, "--output", out_dir, "--schedule-slots", "4"])
    assert rc == 0
    rows = {r["url"]: r for r in spark.read.parquet(out_dir).collect()}
    assert rows["https://a.com/p1"]["seq"] == 0
    assert rows["https://a.com/p2"]["not_before_sec"] == 3.0
    assert rows["https://a.com/p1"]["slot"] == \
        rows["https://a.com/p2"]["slot"]


def test_media_cli_office_ops_r14(spark, capsys):
    """r14: pptxtext/xlsxtext media ops extract office text."""
    import sys

    sys.path.insert(0, "tests")
    from test_office import _pptx, _xlsx

    base = tempfile.mkdtemp(prefix="cli_office_")
    spark.createDataFrame(
        [(1, bytearray(_pptx(
            [b"<a:p><a:r><a:t>deck</a:t></a:r></a:p>"])))],
        "doc_id long, payload binary",
    ).write.mode("overwrite").parquet(base + "/ppt")
    rc = main(["media", "--input", base + "/ppt", "--op", "pptxtext"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["by_format"] == {"pptx": 1}

    spark.createDataFrame(
        [(1, bytearray(_xlsx([b"<row><c><v>7</v></c></row>"]))),
         (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    ).write.mode("overwrite").parquet(base + "/xls")
    rc = main(["media", "--input", base + "/xls", "--op", "xlsxtext"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2  # the junk payload quarantines
    assert out["by_format"] == {"xlsx": 1, "None": 1}
