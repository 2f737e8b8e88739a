"""Decade scaling audit for the r13 operators.

Three families, bench.py methodology (min-of-3 warm, noop sink):

1. **ccitt**: the codec fixture's CCITT payloads (G4 strips + MH
   TIFF, ids 132/133) replicated R and 10R times with shifted
   doc_ids, decoded via multimodal.decode_image — payload bytes
   identical, so the honest expectation is time ∝ rows.
2. **frontier**: crawl_frontier over H and 10H synthetic hosts (one
   robots payload + a sitemapindex + one urlset of U URLs per host,
   a seen set subtracting ~20%) — linear in sitemap URL inventory.
3. **curate_compliance**: curate_corpus with robots_rules +
   psl/domain_cap active (audit=False: one lazy plan) over 5k and
   50k documents-shaped rows.

Usage: python tools/r13_scale_audit.py [R_SMALL] [FACTOR]
Prints one JSON line per run; record the table in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.plans.codec_check import (
    CODEC_FIXTURE_PATH,
)
from youtube_api_data_etl_automation_spark.session import get_spark, ship_package


def _force(df):
    df.write.mode("overwrite").format("noop").save()


def _time(fn, warm=1, runs=3):
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def _ccitt_blobs(spark, replicas: int):
    import pyarrow.parquet as pq

    src = pq.read_table(CODEC_FIXTURE_PATH)
    rows = [(pid, pl) for pid, pl in
            zip(src.column("payload_id").to_pylist(),
                src.column("payload").to_pylist())
            if pid in (132, 133)]
    out = []
    for i in range(replicas):
        for pid, pl in rows:
            out.append((pid + i * 10_000, bytearray(pl)))
    return spark.createDataFrame(out, "doc_id long, payload binary") \
        .repartition(32)


def _frontier_inputs(spark, n_hosts: int, urls_per_host: int = 40):
    hosts = spark.range(n_hosts).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host"))
    robots = hosts.withColumn(
        "payload",
        F.concat(F.lit("User-agent: *\nDisallow: /private/\n"
                       "Sitemap: https://"), F.col("host"),
                 F.lit("/smidx.xml\n")))
    entries = hosts.crossJoin(
        spark.range(urls_per_host).withColumnRenamed("id", "u")
    ).select(
        "host",
        F.concat(
            F.lit("<url><loc>https://"), F.col("host"),
            F.when(F.col("u") % 5 == 0, F.lit("/private/"))
            .otherwise(F.lit("/p/")),
            F.col("u").cast("string"), F.lit("</loc></url>")).alias("e"),
    ).groupBy("host").agg(
        F.concat(F.lit("<urlset>"), F.concat_ws("", F.collect_list("e")),
                 F.lit("</urlset>")).alias("payload"))
    fetches = hosts.select(
        F.concat(F.lit("https://"), F.col("host"),
                 F.lit("/smidx.xml")).alias("url"),
        F.concat(F.lit("<sitemapindex><sitemap><loc>https://"),
                 F.col("host"),
                 F.lit("/sm1.xml</loc></sitemap></sitemapindex>"))
        .alias("payload"),
    ).unionByName(entries.select(
        F.concat(F.lit("https://"), F.col("host"),
                 F.lit("/sm1.xml")).alias("url"), "payload"))
    seen = hosts.crossJoin(spark.range(urls_per_host // 5)
                           .withColumnRenamed("id", "u")).select(
        F.concat(F.lit("https://"), F.col("host"), F.lit("/p/"),
                 (F.col("u") * 5 + 1).cast("string")).alias("url"))
    return robots, fetches, seen


def _docs(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog and "
                  "runs to the hills while a calm wind blows marker"),
            F.col("id").cast("string")).alias("text"),
        F.concat(
            F.lit("https://h"), (F.col("id") % 97).cast("string"),
            F.lit(".s"), (F.col("id") % 7).cast("string"),
            F.lit(".example.org"),
            F.when(F.col("id") % 4 == 0, F.lit("/private/x"))
            .otherwise(F.concat(F.lit("/p/"),
                                F.col("id").cast("string"))))
        .alias("source"),
    ).repartition(32)


def main() -> None:
    r_small = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("r13-scale-audit")
    ship_package(spark)

    from youtube_api_data_etl_automation_spark.corpus import curate_corpus
    from youtube_api_data_etl_automation_spark.operators.multimodal import (
        decode_image,
    )
    from youtube_api_data_etl_automation_spark.operators.robots import (
        crawl_frontier,
        parse_robots,
    )

    results = {}
    for scale, reps in (("1x", r_small), ("10x", r_small * factor)):
        blobs = _ccitt_blobs(spark, reps)
        blobs.persist().count()
        t = _time(lambda: _force(decode_image(blobs, errors="quarantine")))
        blobs.unpersist()
        results[f"ccitt_decode_{scale}"] = round(t, 3)
        print(json.dumps({"op": "ccitt_decode", "scale": scale,
                          "rows": reps * 2, "sec": round(t, 3)}))

    for scale, nh in (("1x", 40 * r_small // 10),
                      ("10x", 40 * r_small)):
        robots, fetches, seen = _frontier_inputs(spark, nh)
        rules = parse_robots(robots).persist()
        fetches = fetches.persist()
        seen = seen.persist()
        rules.count(), fetches.count(), seen.count()
        t = _time(lambda: _force(crawl_frontier(rules, fetches,
                                                seen=seen)))
        for df in (rules, fetches, seen):
            df.unpersist()
        results[f"frontier_{scale}"] = round(t, 3)
        print(json.dumps({"op": "crawl_frontier", "scale": scale,
                          "hosts": nh, "sec": round(t, 3)}))

    for scale, nd in (("1x", 5000), ("10x", 50000)):
        docs = _docs(spark, nd).persist()
        docs.count()
        from youtube_api_data_etl_automation_spark.operators.robots import (
            parse_robots as _pr,
        )
        hosts = docs.select(
            F.regexp_extract("source", r"https://([^/]+)", 1)
            .alias("host")).distinct()
        rules = _pr(hosts.withColumn(
            "payload",
            F.lit("User-agent: *\nDisallow: /private/\n"))).persist()
        rules.count()
        psl = spark.createDataFrame(
            [("org",), ("*.example.org",)], "rule string")

        def run():
            out = curate_corpus(
                docs, robots_rules=rules, domain_cap=50, psl=psl,
                min_tokens=1, quality_min=0.0, n_shards=8,
                audit=False)
            _force(out["documents"])

        t = _time(run)
        docs.unpersist()
        rules.unpersist()
        results[f"curate_compliance_{scale}"] = round(t, 3)
        print(json.dumps({"op": "curate_compliance", "scale": scale,
                          "docs": nd, "sec": round(t, 3)}))

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
