"""Capture .explain("formatted") for headline queries into plans/r14/.

Usage: python tools/r14_capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' -> plans/r14/<query>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from youtube_api_data_etl_automation_spark.plans import QUERIES  # noqa: E402
from youtube_api_data_etl_automation_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r14-capture-plans")
    for name in names:
        spark.catalog.clearCache()
        df = QUERIES[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
