"""Compare two bench records and flag per-query regressions.

Usage: python tools/bench_compare.py BENCH_a.json BENCH_b.json [ratio]

Accepts either the driver's BENCH_r{N}.json wrapper ({"parsed": {...}})
or bench.py's raw one-line JSON. Prints per-query b/a ratios, flags any
query over the threshold (default 2.0 — the BASELINE.md policy), and
exits non-zero if any flagged. Queries present in only one record are
listed but never flagged (registry consolidations rename/fuse queries).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d["queries"]


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    a, b = load(a_path), load(b_path)
    shared = sorted(set(a) & set(b))
    flagged = []
    print(f"{'query':34s} {'a':>7} {'b':>7} {'b/a':>6}")
    for q in shared:
        # bench.py rounds to 3 decimals, so sub-ms queries record 0.0:
        # 0.0 -> 0.0 is a tie (ratio 1), and a blow-up from ~0 is flagged
        # only when the absolute delta is perceptible (noise floor 50 ms).
        if a[q] == 0:
            ratio = 1.0 if b[q] == 0 else float("inf")
        else:
            ratio = b[q] / a[q]
        is_regression = ratio > threshold and (b[q] - a[q]) > 0.05
        mark = " <-- REGRESSION" if is_regression else ""
        if is_regression:
            flagged.append(q)
        print(f"{q:34s} {a[q]:7.3f} {b[q]:7.3f} {ratio:6.2f}{mark}")
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    if only_a:
        print(f"only in {a_path}: {', '.join(only_a)}")
    if only_b:
        print(f"only in {b_path}: {', '.join(only_b)}")
    if not shared:
        print("no shared queries between the two records")
        return 0
    ta, tb = sum(a[q] for q in shared), sum(b[q] for q in shared)
    ratio_txt = f"{tb / ta:.2f}x" if ta else "n/a"
    print(f"shared-set totals: {ta:.3f} -> {tb:.3f} ({ratio_txt})")
    if flagged:
        print(f"{len(flagged)} queries over {threshold}x: {', '.join(flagged)}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
