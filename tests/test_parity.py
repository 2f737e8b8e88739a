"""DuckDB-oracle differential tests (SURVEY.md §5 item 1) — the local mirror
of the driver's CORRECTNESS gate, at sf0.001 for speed. One pytest case per
registered query."""

from __future__ import annotations

import pytest

from tools.parity import compare, duck_connection
from youtube_api_data_etl_automation_spark.plans import QUERIES

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    ok, msg = compare(name, spark, duck, SF_DIR)
    assert ok, msg
