"""Decade scaling audit for the r14 operators.

Three families, bench.py methodology (min-of-3 warm, noop sink):

1. **jbig2**: the codec fixture's JBIG2 PDF (id 1909: one MMR page +
   one arithmetic refusal) replicated R and 10R times with shifted
   doc_ids, extracted via pdf_images — payload bytes identical, so
   the honest expectation is time ∝ rows (MMR decode is linear in
   coded bits, like the r13 ccitt audit).
2. **office**: the pptx (1604) and xlsx (1606) fixtures replicated R
   and 10R, through pptx_text/xlsx_text — zip inflate + regex walk,
   linear in member bytes.
3. **schedule**: schedule_fetches over H and 10H hosts × U frontier
   URLs — one window partitioned by host; host count scales with
   rows so no partition grows, and the expectation is ~linear
   (shuffle on host + per-partition sort of U rows).

Usage: python tools/r14_scale_audit.py [R_SMALL] [FACTOR]
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


def _fixture_blobs(spark, ids: tuple[int, ...], replicas: int):
    import pyarrow.parquet as pq

    src = pq.read_table(CODEC_FIXTURE_PATH)
    rows = [(pid, pl) for pid, pl in
            zip(src.column("payload_id").to_pylist(),
                src.column("payload").to_pylist())
            if pid in ids]
    out = []
    for i in range(replicas):
        for pid, pl in rows:
            out.append((pid + i * 10_000, bytearray(pl)))
    return spark.createDataFrame(out, "doc_id long, payload binary") \
        .repartition(32)


def _frontier_rows(spark, n_hosts: int, urls_per_host: int = 40):
    return spark.range(n_hosts).crossJoin(
        spark.range(urls_per_host).withColumnRenamed("id", "u")
    ).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.concat(F.lit("https://h"), F.col("id").cast("string"),
                 F.lit(".example.com/p/"),
                 F.col("u").cast("string")).alias("url"),
        F.lit(None).cast("string").alias("lastmod"),
        F.when(F.col("id") % 3 == 0,
               (F.col("id") % 5 + 1).cast("double"))
        .alias("crawl_delay_sec"),
    ).repartition(32)


def main() -> None:
    r_small = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("r14-scale-audit")
    ship_package(spark)

    from youtube_api_data_etl_automation_spark.operators.archives import (
        pptx_text,
        xlsx_text,
    )
    from youtube_api_data_etl_automation_spark.operators.pdf import (
        pdf_images,
    )
    from youtube_api_data_etl_automation_spark.operators.robots import (
        schedule_fetches,
    )

    results = {}
    for scale, reps in (("1x", r_small), ("10x", r_small * factor)):
        blobs = _fixture_blobs(spark, (1909,), reps)
        blobs.persist().count()
        t = _time(lambda: _force(pdf_images(blobs, errors="quarantine")))
        blobs.unpersist()
        results[f"jbig2_pdf_{scale}"] = round(t, 3)
        print(json.dumps({"op": "jbig2_pdf_images", "scale": scale,
                          "payloads": reps, "sec": round(t, 3)}))

    for scale, reps in (("1x", r_small * 4), ("10x", r_small * 40)):
        ppt = _fixture_blobs(spark, (1604,), reps)
        xls = _fixture_blobs(spark, (1606,), reps)
        ppt.persist().count(), xls.persist().count()

        def run():
            _force(pptx_text(ppt, errors="quarantine"))
            _force(xlsx_text(xls, errors="quarantine"))

        t = _time(run)
        ppt.unpersist(), xls.unpersist()
        results[f"office_{scale}"] = round(t, 3)
        print(json.dumps({"op": "pptx+xlsx_text", "scale": scale,
                          "payloads": reps * 2, "sec": round(t, 3)}))

    # late-r14 extractors: odf/epub/rtf/eml fixture payloads replicated,
    # all four ops forced per run — the combined document-ladder wall
    from youtube_api_data_etl_automation_spark.operators.archives import (
        epub_text,
        odf_text,
    )
    from youtube_api_data_etl_automation_spark.operators.mail import (
        eml_text,
    )
    from youtube_api_data_etl_automation_spark.operators.rtf import (
        rtf_text,
    )

    for scale, reps in (("1x", r_small * 4), ("10x", r_small * 40)):
        dfs = [(_fixture_blobs(spark, (pid,), reps), op)
               for pid, op in ((1608, odf_text), (1611, epub_text),
                               (2301, rtf_text), (2201, eml_text))]
        for df, _ in dfs:
            df.persist().count()

        def run():
            for df, op in dfs:
                _force(op(df, errors="quarantine"))

        t = _time(run)
        for df, _ in dfs:
            df.unpersist()
        results[f"doc_extract_{scale}"] = round(t, 3)
        print(json.dumps({"op": "odf+epub+rtf+eml_text", "scale": scale,
                          "payloads": reps * 4, "sec": round(t, 3)}))

    # third-wave extractors (late r14): latex + ipynb fixture payloads
    # replicated — both are linear byte scans / JSON walks
    from youtube_api_data_etl_automation_spark.operators.latex import (
        latex_text,
    )
    from youtube_api_data_etl_automation_spark.operators.markdown import (
        markdown_text,
    )
    from youtube_api_data_etl_automation_spark.operators.notebooks import (
        ipynb_text,
    )

    for scale, reps in (("1x", r_small * 4), ("10x", r_small * 40)):
        dfs = [(_fixture_blobs(spark, (pid,), reps), op)
               for pid, op in ((2401, latex_text), (2501, ipynb_text),
                               (2601, markdown_text))]
        for df, _ in dfs:
            df.persist().count()

        def run():
            for df, op in dfs:
                _force(op(df, errors="quarantine"))

        t = _time(run)
        for df, _ in dfs:
            df.unpersist()
        results[f"sci_extract_{scale}"] = round(t, 3)
        print(json.dumps({"op": "latex+ipynb+markdown_text",
                          "scale": scale,
                          "payloads": reps * 3, "sec": round(t, 3)}))

    # code funnel (late r14): stack_filter is pure Column math over a
    # generated text column — the audit pins the map-only projection's
    # decade behavior
    from youtube_api_data_etl_automation_spark.operators.code_quality import (
        stack_filter,
    )

    for scale, nrows in (("1x", r_small * 400),
                         ("10x", r_small * 4000)):
        texts = spark.range(nrows).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("import os\nx = "), F.col("id").cast("string"),
                F.lit("\n" + "print(os.path.join('a', 'b'))\n" * 20),
            ).alias("text"),
        ).persist()
        texts.count()
        t = _time(lambda: _force(stack_filter(texts)))
        texts.unpersist()
        results[f"stack_filter_{scale}"] = round(t, 3)
        print(json.dumps({"op": "stack_filter", "scale": scale,
                          "rows": nrows, "sec": round(t, 3)}))

    for scale, nh in (("1x", 40 * r_small // 10),
                      ("10x", 40 * r_small)):
        frontier = _frontier_rows(spark, nh).persist()
        frontier.count()
        t = _time(lambda: _force(schedule_fetches(frontier, 1000)))
        frontier.unpersist()
        results[f"schedule_{scale}"] = round(t, 3)
        print(json.dumps({"op": "schedule_fetches", "scale": scale,
                          "hosts": nh, "rows": nh * 40,
                          "sec": round(t, 3)}))

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
