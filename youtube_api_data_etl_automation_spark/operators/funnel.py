"""Behavioral funnel analysis over event streams: ordered step
progression per user (signup → click → purchase), the classic product-
analytics query family the reference's pipeline feeds but never answers
(its sink is consumed by exactly this kind of dashboard query; the
reference has no query layer at all — SURVEY.md §2, "none in reference").

Semantics (the standard greedy-earliest funnel): a user completes step k
at the EARLIEST event of the step-k type that is STRICTLY LATER than
their step-(k-1) completion time; step 1 is the user's earliest step-1
event. ``within_sec`` optionally bounds the whole journey: steps ≥ 2
must land within that many seconds of the user's step-1 time (the
windowed funnel every product-analytics engine offers). Greedy-earliest
is not "any subsequence" — it is deterministic, SQL-mirrorable, and the
convention of the funnel implementations users migrate from.

Scale shape
-----------
One column-pruned scan of events, filtered to the step types and keyed
by user. Each step beyond the first is one equi-join of the (shrinking)
per-user completion relation against the step's events plus a per-user
min — every shuffle is on the user key, every aggregate is partial
(map-side min), and the per-step relations carry one row per surviving
user. ``k`` steps ⇒ ``k`` user-keyed aggregates and ``k-1`` joins, each
over at most |users who reached the previous step| rows on one side.
No collect, no window over unbounded partitions, no per-user arrays
(an array-fold funnel caps at collect_list's per-user memory; the join
chain doesn't).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6


def funnel_users(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_sec: int | None = None,
) -> DataFrame:
    """Per-user funnel completion times: one row per user who completed
    at least step 1, with columns ``t_1 .. t_k`` (``t_j`` NULL once the
    user drops out — a NULL never has later steps non-NULL).

    The per-user detail feeds :func:`funnel` (the step rollup), cohort
    splits (join demographics on ``user_col``), and time-to-convert
    analyses (``t_k - t_1``)."""
    if len(steps) < 1:
        raise ValueError("need at least one funnel step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    ).filter(F.col("__t").isin(list(steps)))

    cur = (
        ev.filter(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("t_1"))
    )
    for k, s in enumerate(steps[1:], start=2):
        step_ev = ev.filter(F.col("__t") == s).select("__u", "__ts")
        cond: Column = F.col("__ts") > F.col(f"t_{k - 1}")
        if within_sec is not None:
            cond = cond & (
                F.col("__ts")
                <= F.col("t_1") + F.expr(f"INTERVAL {int(within_sec)} SECOND")
            )
        reached = (
            step_ev.join(cur, "__u")
            .filter(cond)
            .groupBy("__u")
            .agg(
                # earlier completion times are constant per user; min()
                # carries them through without a second join back
                *[F.min(f"t_{j}").alias(f"t_{j}") for j in range(1, k)],
                F.min("__ts").alias(f"t_{k}"),
            )
        )
        # keep dropped-out users (left join back) so the relation stays
        # "everyone who entered", with NULLs from the drop-out step on
        cur = cur.join(
            reached.select("__u", f"t_{k}"), "__u", "left"
        )
    return cur.withColumnRenamed("__u", user_col)


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_sec: int | None = None,
) -> DataFrame:
    """Step rollup of :func:`funnel_users`: one row per step —
    ``(step, event_type, n_users, conversion)`` with ``conversion`` =
    users at this step / users at step 1 (round6; 1.0 at step 1, NULL if
    nobody entered). ``n_users`` is monotonically non-increasing by
    construction."""
    per_user = funnel_users(
        events,
        steps,
        user_col=user_col,
        type_col=type_col,
        ts_col=ts_col,
        within_sec=within_sec,
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"t_{k}")).cast("long").alias(f"n_{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    rows = [
        F.struct(
            F.lit(k).cast("int").alias("step"),
            F.lit(s).alias("event_type"),
            F.col(f"n_{k}").alias("n_users"),
            F.when(
                F.col("n_1") > 0,
                round6(F.col(f"n_{k}").cast("double") / F.col("n_1")),
            ).alias("conversion"),
        )
        for k, s in enumerate(steps, start=1)
    ]
    return counts.select(F.inline(F.array(*rows)))


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their FIRST active
    day; each cell is how many of them were active again ``offset_days``
    later. ``(cohort_day, offset_days, n_active, cohort_size,
    retention)``, one row per non-empty cell (offset 0 always equals the
    cohort size); ``retention`` = n_active / cohort_size (round6). The
    funnel answers "do users progress?", this answers "do they come
    back?" — together the behavioral pair every event sink feeds.

    Scale shape: one column-pruned scan → per-(user, day) distinct (the
    only user-keyed shuffle; per-day activity collapses map-side), a
    cohort join against the |users|-row first-day relation, then a
    (cohort, offset)-keyed count — every aggregate partial, cell count
    bounded by days², independent of |events|. ``max_offset_days`` caps
    the matrix width (dashboards rarely read past 90)."""
    u, ts = F.col(user_col), F.col(ts_col)
    act = (
        events.select(u.alias("__u"), F.to_date(ts).alias("__day"))
        .distinct()
    )
    first = act.groupBy("__u").agg(F.min("__day").alias("cohort_day"))
    j = act.join(first, "__u").select(
        "__u",
        "cohort_day",
        F.datediff(F.col("__day"), F.col("cohort_day")).alias("offset_days"),
    )
    if max_offset_days is not None:
        j = j.filter(F.col("offset_days") <= int(max_offset_days))
    # act is distinct per (user, day) already, so the cell count needs no
    # second distinct — a plain count is the distinct-user count
    cells = j.groupBy("cohort_day", "offset_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return cells.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        F.col("offset_days").cast("int").alias("offset_days"),
        "n_active",
        "cohort_size",
        round6(F.col("n_active").cast("double") / F.col("cohort_size")).alias(
            "retention"
        ),
    )
