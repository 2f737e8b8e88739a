"""int8 quantization: round-trip error bound + cosine preservation on real
embeddings, zero-vector degeneracy, and 4x storage narrowing."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.functions.vectors import (
    cosine_similarity,
    dequantize_int8,
    quantize_int8,
)
from youtube_api_data_etl_automation_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_roundtrip_error_within_half_step(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    both = emb.select(
        "embedding", dequantize_int8(quantize_int8("embedding")).alias("deq")
    ).select(
        # max per-element |v - deq| must be <= max|v|/254 (half a code step).
        F.aggregate(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                "deq",
                lambda a, b: F.abs(a - b),
            ),
            F.lit(0.0),
            lambda acc, v: F.greatest(acc, v),
        ).alias("max_err"),
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, v: F.greatest(acc, F.abs(v)),
        ).alias("amax"),
    )
    bad = both.filter(F.col("max_err") > F.col("amax") / 254.0 + 1e-12)
    assert bad.count() == 0


def test_cosine_preserved_on_real_embeddings(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(200)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") == F.col("ib") - 1)
    scored = pairs.select(
        cosine_similarity("va", "vb").alias("exact"),
        cosine_similarity(
            dequantize_int8(quantize_int8("va")),
            dequantize_int8(quantize_int8("vb")),
        ).alias("quant"),
    )
    worst = scored.agg(F.max(F.abs(F.col("exact") - F.col("quant")))).first()[0]
    assert worst < 0.02, worst  # int8 keeps cosine to ~1e-3 typically


def test_zero_vector_roundtrips_to_zero(spark):
    df = spark.createDataFrame([([0.0, 0.0, 0.0],)], "v array<float>")
    r = df.select(
        quantize_int8("v").alias("qs"), dequantize_int8(quantize_int8("v")).alias("deq")
    ).first()
    assert r.qs.scale == 0.0 and list(r.deq) == [0.0, 0.0, 0.0]


def test_codes_are_tinyint(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    schema = emb.select(quantize_int8("embedding").alias("qs")).schema
    q_field = schema["qs"].dataType["q"].dataType
    assert str(q_field.elementType) == "ByteType()"
