"""JSONL ingest: schema enforcement, corrupt-line quarantine, lossless
partition of input lines, and round-trip with the documents table."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.sources.text_files import read_jsonl
from youtube_api_data_etl_automation_spark.sources.tables import load_table

from .conftest import SF_DIR

_SCHEMA = "doc_id long, text string, lang string"


def test_corrupt_lines_quarantined_not_fatal(spark):
    d = tempfile.mkdtemp(prefix="jsonl_")
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en"}',
        'this is not json at all',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
        '{"doc_id": 3, "text": "truncated...',
        '{"doc_id": 4, "text": null, "lang": "de"}',
    ]
    with open(os.path.join(d, "part-0.jsonl"), "w") as f:
        f.write("\n".join(lines))
    good, corrupt = read_jsonl(spark, d, _SCHEMA)
    assert good.columns == ["doc_id", "text", "lang"]
    assert {r.doc_id for r in good.collect()} == {1, 2, 4}
    raws = [r.raw_line for r in corrupt.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)
    assert good.count() + corrupt.count() == len(lines)


def test_documents_roundtrip_through_jsonl(spark):
    docs = load_table(spark, SF_DIR, "documents")
    d = tempfile.mkdtemp(prefix="jsonl_rt_")
    docs.select("doc_id", "text", "lang").write.mode("overwrite").json(d)
    good, corrupt = read_jsonl(spark, d, _SCHEMA)
    assert corrupt.count() == 0
    assert good.count() == docs.count()
    # Content equality via order-insensitive fingerprint.
    fp = lambda df: df.select(
        F.md5(F.concat_ws("\x00", "doc_id", "text", "lang")).alias("h")
    ).agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long"))).first()[0]
    assert fp(good) == fp(docs.select("doc_id", "text", "lang"))


def test_clustered_write_uses_zstd(spark):
    from youtube_api_data_etl_automation_spark.operators.layout import write_clustered

    out = tempfile.mkdtemp(prefix="zstd_layout_")
    ev = load_table(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    write_clustered(ev, out, "day", "user_id", num_files=4)
    files = []
    for root, _, names in os.walk(out):
        files += [n for n in names if n.endswith(".parquet")]
    assert files and all(".zstd." in n for n in files), files[:3]


def test_csv_corrupt_lines_quarantined(spark):
    from youtube_api_data_etl_automation_spark.sources.text_files import (
        read_csv_strict,
    )

    d = tempfile.mkdtemp(prefix="csv_")
    with open(os.path.join(d, "part-0.csv"), "w") as f:
        f.write(
            "doc_id,n,lang\n"
            "1,10,en\n"
            "2,notanumber,fr\n"   # type mismatch -> quarantine
            "3,30,de\n"
        )
    good, corrupt = read_csv_strict(spark, d, "doc_id long, n long, lang string")
    assert {r.doc_id for r in good.collect()} == {1, 3}
    raws = [r.raw_line for r in corrupt.collect()]
    assert raws and "notanumber" in raws[0]
    assert good.count() + corrupt.count() == 3


def test_read_parquet_evolving(spark, tmp_path):
    """Schema evolution across write batches: old files lack new columns
    (NULL-filled), contract columns missing everywhere are typed NULLs,
    on-disk extras are dropped, and a type conflict is a hard error."""
    from youtube_api_data_etl_automation_spark.sources.text_files import (
        read_parquet_evolving,
    )

    p = str(tmp_path / "sink")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame(
        [(2, "b", 3.5, "extra")], "id long, name string, score double, debug string"
    ).write.mode("append").parquet(p)

    out = read_parquet_evolving(
        spark, p, "id long, name string, score double, added_later int"
    )
    assert out.columns == ["id", "name", "score", "added_later"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 3.5
    assert rows[1]["added_later"] is None and rows[2]["added_later"] is None
    assert "debug" not in out.columns

    import pytest as _pytest

    with _pytest.raises(TypeError, match="schema drift"):
        read_parquet_evolving(spark, p, "id string, name string")


def test_read_parquet_evolving_nullability_tolerant(spark, tmp_path):
    """Nested-nullability differences (array containsNull, struct-field
    nullable inside the element type) are benign — only genuine TYPE
    conflicts hard-error."""
    from pyspark.sql import types as T

    from youtube_api_data_etl_automation_spark.sources.text_files import (
        read_parquet_evolving,
    )

    p = str(tmp_path / "sink")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "tags", T.ArrayType(T.StringType(), containsNull=False), False
            ),
            T.StructField(
                "meta",
                T.StructType([T.StructField("k", T.StringType(), False)]),
                False,
            ),
        ]
    )
    spark.createDataFrame([(1, ["a", "b"], ("x",))], schema).write.parquet(p)

    # Contract declares everything nullable — must read fine.
    out = read_parquet_evolving(
        spark, p, "id long, tags array<string>, meta struct<k: string>"
    )
    assert out.collect()[0]["tags"] == ["a", "b"]

    # A real element-type conflict still errors.
    import pytest as _pytest

    with _pytest.raises(TypeError, match="schema drift"):
        read_parquet_evolving(
            spark, p, "id long, tags array<int>, meta struct<k: string>"
        )
