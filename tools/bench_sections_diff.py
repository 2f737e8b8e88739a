"""Round-over-round per-section bench comparison.

Usage:
    python tools/bench_sections_diff.py OLD_BENCH_SECTIONS.json [NEW.json]

NEW defaults to the repo's current BENCH_SECTIONS.json. Prints one line
per (query, section) with old/new seconds and the ratio, flagging
ratios beyond the 2x per-section policy (BASELINE.md r9) outside the
~1.5x single-measurement environment-variance band — i.e., a section is
REPORTED at >1.5x and FLAGGED at >2x; sections only present on one side
are listed as added/removed (content change, not regression). Exit 2
when anything is flagged, so a round script can gate on it.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    old = json.load(open(sys.argv[1]))
    new_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SECTIONS.json",
    )
    new = json.load(open(new_path))
    flagged = []
    reported = []
    for name in sorted(set(old["sections"]) | set(new["sections"])):
        o = old["sections"].get(name, {}).get("times", {})
        n = new["sections"].get(name, {}).get("times", {})
        for sec in sorted(set(o) | set(n)):
            ov, nv = o.get(sec), n.get(sec)
            if ov is None or nv is None:
                reported.append(
                    f"{name}.{sec}: "
                    + ("added" if ov is None else "removed")
                    + f" (old={ov}, new={nv})"
                )
                continue
            if ov <= 0:
                continue
            ratio = nv / ov
            line = f"{name}.{sec}: {ov:.3f}s -> {nv:.3f}s ({ratio:.2f}x)"
            if ratio > 2.0:
                flagged.append(line + "  FLAGGED (>2x policy)")
            elif ratio > 1.5:
                reported.append(line + "  (beyond variance band)")
    for line in reported:
        print(line)
    for line in flagged:
        print(line)
    if not reported and not flagged:
        print("all sections within the variance band")
    return 2 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
