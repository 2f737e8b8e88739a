"""Registry mapping query names → (Spark callable, DuckDB oracle SQL).

Contract (driver, /root/repo/__spark_entry__.py): each callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL runs on DuckDB
views named after the parquet tables. The driver compares row count, schema,
and an order-insensitive value hash — so every computed column is aliased
identically on both sides, and floating-point results are rounded (or
computed via exact decimal sums) at the query edge on BOTH sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator registering a demonstration query and its oracle SQL.

    ``oracle=None`` marks a non-SQL-expressible op (the driver then records
    a weaker rows-only check — keep these rare and justified).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
