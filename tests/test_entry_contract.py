"""Pin the driver contract (__spark_entry__.py): entry() shape, registry
integrity, and oracle/query key alignment — the exact properties the
external driver depends on."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows_with_stable_schema(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "o_orderpriority",
        "order_year",
        "n_lines",
        "revenue",
        "avg_unit_price",
    ]


def test_every_oracle_key_has_a_query():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # Rows-only entries are the documented exceptions, kept deliberately rare.
    rows_only = set(q) - set(o)
    assert rows_only == {"kmeans_embeddings", "reference_etl_video_stats"}


def test_query_callables_are_two_arg(spark):
    import inspect

    for name, fn in entry_mod.queries().items():
        params = inspect.signature(fn).parameters
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"
