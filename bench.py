"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with the
noop sink (full computation, no driver collect overhead).

Sectioned observability (r9): the registry's 50-row cap made the heavy rows
3-6-section tag-unions, so a regression inside one section is unattributable
from the row total alone. After the row timings, every fused row is re-timed
PER SECTION — `df.filter(tag == section)` lets Catalyst constant-fold the
per-branch literal tag and prune the other union arms to empty relations
(verified: sampling_audits drops 8 parquet scans -> 1 under a section
filter) — and the per-section wall times land in BENCH_SECTIONS.json next
to this file. Methodology notes:
 - a section's time is its STANDALONE cost (cache cleared between sections,
   so shared persisted projections are re-materialized per section); the
   section sum therefore legitimately exceeds the fused row's time wherever
   sections share work.
 - `__construct__` is the one call to QUERIES[name] itself — it captures
   eager driver-side work some rows do at build time (streaming availableNow
   drains in sessionize_methods, bounded control-plane collects elsewhere)
   that a per-section force can never see.
 - min-of-2 per section (vs min-of-3 per row): sections inherit the row
   warm-up, and the section pass must stay inside the driver's budget.
Set SPARK_GRAFT_BENCH_NO_SECTIONS=1 to skip the pass (row line unchanged).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from youtube_api_data_etl_automation_spark.plans import QUERIES
from youtube_api_data_etl_automation_spark.session import get_spark

# Representative spread: anti-join core, heavy aggregation, star join, window,
# as-of, scalar-transform block, text/dedup/vector north-star ops.
# r2 registry consolidation (see BASELINE.md): broadcast_join_parts folded
# into join_star_revenue, null_safe_ratios into the flagship, distinct_ids
# into union_distinct_slices; window_running_lag and the fused multimodal
# query joined the headline set.
# r4 consolidation: asof_last_purchase folded into window_running_lag,
# union_distinct_slices into setops_except_intersect, rolling_hash_docs
# into text_stats_docs; the three freed slots went to
# repeated_substring_spans, scd2_priority_history, lang_cap_docs.
# r5 consolidation: window_rank_orders folded into
# window_distribution_stats (which takes its headline slot); the freed
# registry slot went to corpus_curation_report.
# r6 consolidation: embedding_knn_batch + ann_sign_lsh_topk (identical
# output schema, same query batch) tag-unioned into ann_topk_methods;
# the freed registry slot went to semantic_neardup. Later in r6:
# sessionize_events + stateful_session_stats fused into sessionize_methods
# (which takes the headline slot); the slots freed by that fusion plus the
# neardup-pairs and streaming-modes fusions went to pagerank_copurchase,
# mixing_temperature, and pack_token_sequences (the last two join the
# headline set as the curation-pipeline representatives).
# r7 consolidation: weighted_sample_aes tag-unioned into sampling_audits
# (the `aes` section); the freed registry slot went to
# profile_drift_report (drift monitoring under the oracle), which also
# joins the headline set.
HEADLINE = [
    "flagship_new_order_enrichment",
    "anti_join_new_keys",
    "groupby_agg_pricing",
    "join_star_revenue",
    "window_distribution_stats",
    "window_running_lag",
    "iso_duration_seconds",
    "setops_except_intersect",
    "text_stats_docs",
    "dedup_exact_docs",
    "jaccard_pairs_methods",
    "ann_topk_methods",
    "semantic_neardup",
    "multimodal_frame_features",
    "sessionize_methods",
    "salted_join_revenue",
    "percentile_prices",
    "ivf_ann_topk",
    "term_stats_tfidf_pmi",
    "dedup_connected_components",
    # r2 curation additions (plans/curation.py)
    "pii_redact_docs",
    "decontam_ngram_hits",
    "sampling_audits",
    # r4 additions (plans/history.py)
    "repeated_substring_spans",
    "scd2_priority_history",
    "lang_cap_docs",
    # r13 addition: the URL/compliance row (psl/canon/robots/frontier),
    # split off lang_cap_docs per VERDICT r12 item 6
    "url_compliance_docs",
    # r6 additions (plans/curation.py)
    "mixing_temperature",
    "pack_token_sequences",
    # late-r6 addition: the single-pass table profiler (plans/advanced.py)
    "table_profile_orders",
    # r7 addition: drift monitoring (plans/advanced.py)
    "profile_drift_report",
]


# Fused headline rows -> (tag column, union-branch tag values). Hardcoded
# rather than discovered from data: tag-value discovery is data-dependent
# (anti_join_new_keys' `empty_gate` arm and semantic_neardup's `pair` arm
# produce zero rows at small sf and would vanish from a distinct() probe).
# A renamed/stale entry shows up as a ~0 s section (every branch folds to
# false), which is loud enough in the BASELINE.md table.
SECTIONS: dict[str, tuple[str, list[str]]] = {
    "anti_join_new_keys": ("section", ["delta", "empty_gate"]),
    "dedup_exact_docs": ("section", ["groups", "lines", "incremental"]),
    "jaccard_pairs_methods": ("method", ["minhash_lsh", "ngram_exact"]),
    "ann_topk_methods": ("method", ["exact", "sign_lsh", "pq_adc"]),
    "semantic_neardup": ("section", ["pair", "summary"]),
    "ivf_ann_topk": ("section", ["topk", "cells", "recall"]),
    "sessionize_methods": ("method", ["window", "stateful", "session_window"]),
    "term_stats_tfidf_pmi": ("section", ["tfidf", "pmi", "vocab"]),
    "decontam_ngram_hits": ("section", ["exact", "bloom"]),
    "sampling_audits": (
        "section",
        ["split", "grouped", "stratified", "aes", "dsir_lambda", "dsir",
         "diversity"],
    ),
    "table_profile_orders": (
        "section", ["stats", "hist", "topk", "checks", "state"],
    ),
    "profile_drift_report": ("section", ["moments", "psi", "semantic"]),
    # r10: the codec golden section (fixed ~43-payload fixture decode)
    # vs the sf-scaled ASCII frame plumbing
    "multimodal_frame_features": (
        "section", ["frames", "codec", "codec_sniff"],
    ),
    # r13: the URL/compliance sections moved to their own row and
    # gained the crawl_frontier composition
    "lang_cap_docs": ("section", ["lang_cap", "domains"]),
    "url_compliance_docs": (
        "section", ["psl", "canon", "robots", "delays", "frontier"],
    ),
}


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def section_pass(spark, sf_dir: str, sf) -> None:
    """Per-section wall times for every fused headline row, written to
    BENCH_SECTIONS.json (see module docstring for methodology).

    The query is RE-CONSTRUCTED for every section: clearCache() between
    sections removes not just cached data but the persist REGISTRATION
    made inside the query builder, so reusing one DataFrame would leave
    later sections with no cache reuse even between their own two runs
    (measured: semantic_neardup.summary 9.0 s both runs off a stale
    registration vs 2.1 s warm — the row methodology's number). A fresh
    construct per section restores the row loop's semantics: min over
    runs with the query's own persists alive."""
    from pyspark.sql import functions as F

    out: dict[str, dict] = {}
    for name, (tag, secs) in SECTIONS.items():
        if name not in QUERIES or name not in HEADLINE:
            continue
        row: dict[str, float | None] = {}
        construct_best = float("inf")
        stale_tag = False
        for s in secs:
            spark.catalog.clearCache()
            try:
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                construct_best = min(
                    construct_best, time.perf_counter() - t0
                )
            except Exception as e:  # noqa: BLE001 — the audit must be total
                print(f"bench: {name} section construct FAILED: {e}",
                      file=sys.stderr)
                row[s] = None
                continue
            if tag not in df.columns:
                print(f"bench: {name} lost its {tag!r} tag column; "
                      "SECTIONS map is stale", file=sys.stderr)
                stale_tag = True
                break
            sub = df.filter(F.col(tag) == s)
            best = float("inf")
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    force(sub)
                    best = min(best, time.perf_counter() - t0)
                row[s] = round(best, 3)
            except Exception as e:  # noqa: BLE001
                print(f"bench: {name}.{s} FAILED: {e}", file=sys.stderr)
                row[s] = None
        spark.catalog.clearCache()
        if stale_tag:
            continue
        if construct_best < float("inf"):
            row["__construct__"] = round(construct_best, 3)
        out[name] = {"tag": tag, "times": row}

    # r12: the codec section is one growing blob over ~19 payload
    # families — time each family standalone (codec_stats(families=...))
    # so the 2x policy can localize a regression inside it. Keys land in
    # the same times dict as `codec:<family>`.
    if "multimodal_frame_features" in out:
        from youtube_api_data_etl_automation_spark.plans.codec_check import (
            CODEC_FAMILIES,
            codec_stats,
        )

        row = out["multimodal_frame_features"]["times"]
        for fam in CODEC_FAMILIES:
            spark.catalog.clearCache()
            best = float("inf")
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    force(codec_stats(spark, (fam,)))
                    best = min(best, time.perf_counter() - t0)
                row[f"codec:{fam}"] = round(best, 3)
            except Exception as e:  # noqa: BLE001 — the audit must be total
                print(f"bench: codec family {fam} FAILED: {e}",
                      file=sys.stderr)
                row[f"codec:{fam}"] = None
        spark.catalog.clearCache()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_SECTIONS.json")
    with open(path, "w") as f:
        json.dump({"sf": sf, "runs_per_section": 2, "sections": out},
                  f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"bench: wrote per-section timings to {path}", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # A stale HEADLINE name (registry consolidation) must not kill the
    # whole bench run — drop it loudly instead.
    missing = [n for n in HEADLINE if n not in QUERIES]
    if missing:
        print(f"bench: skipping unknown queries {missing}", file=sys.stderr)
        HEADLINE[:] = [n for n in HEADLINE if n in QUERIES]
    spark = get_spark("bench")
    # Warm-up: run every headline plan once at the smallest sf so codegen
    # compilation + JVM JIT are excluded from the measured sf timings.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                force(QUERIES[name](spark, warm_dir))
            except Exception:
                pass
        spark.catalog.clearCache()

    # Min of three runs per query: steady-state throughput, not first-run
    # scheduler/codegen noise (plans are identical between runs; observed
    # multi-second GC/JIT spikes occasionally survive a min-of-2).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                force(QUERIES[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — the audit must be total
            # One broken query must not abort the whole bench (the driver
            # would record NO line at all); report it loudly and keep
            # timing the rest. A None value in the JSON is the failure
            # signal.
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = None
            spark.catalog.clearCache()
            continue
        timings[name] = round(best, 3)
        # Queries that persist() shared projections leave those relations in
        # the CacheManager (reused across the 3 runs above — same
        # canonicalized plan — so this doesn't change timing semantics);
        # release them so the bench session's footprint stays bounded.
        # SPARK_GRAFT_BENCH_KEEP_CACHE=1 skips the per-query release: the
        # pre-r5 methodology, kept only for A/B attribution of the r4→r5
        # drift (BASELINE.md); the isolated default is the record.
        if not os.environ.get("SPARK_GRAFT_BENCH_KEEP_CACHE"):
            spark.catalog.clearCache()

    if not os.environ.get("SPARK_GRAFT_BENCH_NO_SECTIONS"):
        section_pass(spark, sf_dir, sf)

    total = round(sum(t for t in timings.values() if t is not None), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
