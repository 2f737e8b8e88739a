"""Deterministic per-group capping (domain/source frequency caps).

Web-scale corpora are dominated by a few hot domains; standard curation
caps each domain's contribution (Common-Crawl-style "no more than N pages
per host"). The naive form — row_number over every group — sorts the
ENTIRE corpus inside group windows even though almost all groups are under
the cap. This operator takes the two-path form:

- one partial-aggregated count finds the over-cap groups (tiny relation —
  one row per group — broadcast);
- rows of under-cap groups pass through with NO window and NO sort
  (broadcast anti-join, map-side);
- only over-cap groups' rows pay the rank, ordered by a content-stable
  salted md5 so the kept subset is reproducible across runs, engines,
  partitionings, and corpus growth (a kept row can only leave if its
  group gains >cap better-hashed rows — never because of physical layout).

Results are identical to the plain whole-corpus row_number form (which is
what the DuckDB oracle runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_per_group(df: DataFrame, *, group_col: str, id_col: str,
                  cap: int, salt: str = "cap:") -> DataFrame:
    """Keep at most ``cap`` rows per ``group_col`` value, selected by
    ascending md5(salt ++ id) with ``id_col`` as the final tie-break.
    Returns the kept rows with the original schema."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    over = counts.filter(F.col("_n") > cap).select(
        F.col(group_col).alias("_over_g")
    )

    # NULL is a real group (unknown domain/host keys are common in web
    # corpora): groupBy and the window both treat NULL as one partition, so
    # the routing joins must match it too — a null-unsafe USING-join would
    # send every NULL-keyed row down the uncapped pass-through path.
    route = F.col(group_col).eqNullSafe(F.col("_over_g"))
    under_rows = df.join(F.broadcast(over), route, "left_anti")
    over_rows = df.join(F.broadcast(over), route, "left_semi")

    rank_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(rank_key, F.col(id_col))
    kept_hot = (
        over_rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return under_rows.unionByName(kept_hot).select(*df.columns)
