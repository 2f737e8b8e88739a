"""r14 optimization round: per-query construct/force profile.

For every headline query: time QUERIES[name](spark, sf_dir) (the construct,
which some rows spend eager driver work in), count py4j round-trips during
construct (each Column op is one), then min-of-3 noop-sink force. Writes
tools/r14_opt_profile.json. Run on an idle box.

Usage: python tools/r14_opt_profile.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, force  # noqa: E402
from youtube_api_data_etl_automation_spark.plans import QUERIES  # noqa: E402
from youtube_api_data_etl_automation_spark.session import get_spark  # noqa: E402

_calls = {"n": 0}


def _install_py4j_counter() -> None:
    # Spark 4 uses py4j's ClientServer (pinned-thread) mode; classic
    # GatewayConnection is patched too for completeness.
    from py4j import clientserver, java_gateway

    def _wrap(cls):
        orig = cls.send_command

        def counted(self, *a, **kw):
            _calls["n"] += 1
            return orig(self, *a, **kw)

        cls.send_command = counted

    _wrap(java_gateway.GatewayConnection)
    _wrap(clientserver.ClientServerConnection)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:] or HEADLINE
    if not os.environ.get("R14_PROFILE_NO_COUNTER"):
        _install_py4j_counter()
    spark = get_spark("r14-opt-profile")
    # bench.py-style warm-up at the smallest sf: codegen compilation and
    # JVM JIT are excluded from the measured timings.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and not os.environ.get("R14_PROFILE_COLD"):
        for name in names:
            try:
                force(QUERIES[name](spark, warm_dir))
            except Exception:
                pass
        spark.catalog.clearCache()
    out = {}
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile:{name}:construct")
        c0 = _calls["n"]
        t_construct = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t_construct = min(t_construct, time.perf_counter() - t0)
        py4j_construct = (_calls["n"] - c0) // 3
        best = float("inf")
        spark.sparkContext.setJobDescription(f"profile:{name}:force")
        for _ in range(3):
            t0 = time.perf_counter()
            force(df)
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "construct_min3_sec": round(t_construct, 3),
            "py4j_calls_construct": py4j_construct,
            "force_min3_sec": round(best, 3),
            "total_sec": round(t_construct + best, 3),
        }
        print(f"{name:32s} construct={t_construct:6.2f}s "
              f"py4j={py4j_construct:6d} force={best:6.2f}s",
              file=sys.stderr)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r14_opt_profile.json")
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "rows": out}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
    tot_c = sum(r["construct_min3_sec"] for r in out.values())
    tot_f = sum(r["force_min3_sec"] for r in out.values())
    print(json.dumps({"construct_total": round(tot_c, 2),
                      "force_total": round(tot_f, 2)}))


if __name__ == "__main__":
    main()
