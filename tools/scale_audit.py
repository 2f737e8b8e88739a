"""Decade scaling audit: time selected registry queries at two scales.

Usage:
    python tools/make_scale_sf.py /root/testdata/sf0.1 /tmp/scale_sf1.0 10
    python tools/scale_audit.py /root/testdata/sf0.1 /tmp/scale_sf1.0 \
        table_profile_orders term_stats_tfidf_pmi ...

Prints one JSON line: per-query seconds at each dir (min of 3 runs after a
warm-up, matching bench.py methodology) and the big/small ratio. A ratio
near the replication factor = linear scaling; materially above it = a
super-linear term to root-cause in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_api_data_etl_automation_spark.plans import QUERIES
from youtube_api_data_etl_automation_spark.session import get_spark


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    small, big = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("scale-audit")
    out: dict[str, dict] = {}
    for name in names:
        timings = {}
        for label, sf_dir in (("small", small), ("big", big)):
            try:
                force(QUERIES[name](spark, sf_dir))  # warm-up (JIT/codegen)
                spark.catalog.clearCache()
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    force(QUERIES[name](spark, sf_dir))
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                timings[label] = round(best, 3)
            except Exception as e:  # noqa: BLE001 — the audit must be total
                print(f"scale_audit: {name}@{label} FAILED: {e}",
                      file=sys.stderr)
                timings[label] = None
        ratio = (
            round(timings["big"] / timings["small"], 2)
            if timings.get("small") and timings.get("big")
            else None
        )
        out[name] = {**timings, "ratio": ratio}
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"small_dir": small, "big_dir": big, "queries": out}))


if __name__ == "__main__":
    main()
