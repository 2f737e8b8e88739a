"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with the
noop sink (full computation, no driver collect overhead).
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
    # r6 additions (plans/curation.py)
    "mixing_temperature",
    "pack_token_sequences",
    # late-r6 addition: the single-pass table profiler (plans/advanced.py)
    "table_profile_orders",
    # r7 addition: drift monitoring (plans/advanced.py)
    "profile_drift_report",
]


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


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
