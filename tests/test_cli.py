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
