"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every registered query at a given sf dir on BOTH engines and compares
row count, column names, and order-insensitive values (floats compared
exactly — queries are expected to round/exact-sum at their edges).

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from youtube_api_data_etl_automation_spark.plans import ORACLES, QUERIES
from youtube_api_data_etl_automation_spark.session import get_spark
from youtube_api_data_etl_automation_spark.sources.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def compare(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        # Rows-only queries must at least produce rows: an unconditional
        # PASS would mask a regression to an empty relation (r6 review).
        # (All 50 registered queries currently have oracles — this path
        # guards any future oracle-less addition.)
        if not srows:
            return False, "rows-only EMPTY RESULT (0 rows)"
        return True, f"rows-only ({len(srows)} rows)"
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    if sorted(scols) != sorted(dcols):
        return False, f"COLUMN MISMATCH spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}"
    ns, nd = norm_rows(scols, srows), norm_rows(dcols, drows)
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
        return False, f"VALUE MISMATCH ({len([1 for a, b in zip(ns, nd) if a != b])} rows) e.g. {diffs}"
    return True, f"ok ({len(srows)} rows)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("parity-check")
    con = duck_connection(sf_dir)
    failures = 0
    for name in names:
        try:
            ok, msg = compare(name, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"ERROR {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {msg}")
        failures += 0 if ok else 1
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
