"""Timer-closed streaming sessionization via ``transformWithStateInPandas``
(Spark 4's arbitrary-stateful-processing API: typed state + event-time
timers + TTL, RocksDB-backed).

Complements ``streaming/stateful.py`` (applyInPandasWithState, update-mode
rollups of every touched session): this operator emits each session ONCE,
when it is known closed — either because a later event arrived past the
gap ('gap'), or because the event-time timer registered at
``last_event + gap`` expired under the advancing watermark ('timer').
Append-once semantics are what a downstream training-data job wants: no
last-emission-wins dedup, every emitted row is final.

Scale shape: state per user is one fixed-width row (ValueState) plus one
pending timer; both live in the RocksDB state store, so 1e9 users spread
across executors without heap pressure. The only shuffle is the
groupBy(user_id) the stateful operator requires. Reference parity: the
closed-session rollups match the batch sessionizer
(operators/sessionize.py) — pinned by tests/test_transform_state.py.

ENVIRONMENT GATE: transformWithState's Python state server speaks protobuf,
and this container ships no ``google.protobuf`` — so the end-to-end
streaming test skips here (it runs wherever protobuf exists). The processor
LOGIC is still fully verified: tests drive handleInputRows /
handleExpiredTimer directly through a faked handle over real event data and
compare against the batch sessionizer (the same direct-call contract Spark's
own runtime uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAP_US_DEFAULT = 30 * 60 * 1_000_000

_OUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, sum_value double, closed_by string"
)

# RocksDB is mandatory for transformWithState (the typed-state column
# families aren't implemented by the default HDFS-backed store).
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def make_session_closer(gap_minutes: int = 30):
    """Build the SessionCloser StatefulProcessor for ``gap_minutes``.

    The class is defined INSIDE this factory on purpose: cloudpickle ships
    nested classes by value, while a module-level class would be pickled by
    reference and crash executors whose Python workers don't have this
    package on sys.path (same rule as streaming/stateful.py). Exposed
    separately from timer_closed_sessions so tests can drive the processor
    directly (see module docstring's environment gate).
    """
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000

    class SessionCloser(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            # (start_us, last_us, n_events, n_vals, sum_micros) — integer
            # micro-units (1e-6, the batch op's DECIMAL(18,6) grid) keep
            # the monetary fold exact and order-stable; n_vals counts
            # non-NULL values so an all-NULL session emits NULL like the
            # batch SUM does (r6 parity fix — the old cents fold both
            # crashed on NULL values and rounded half-up where
            # stateful.py rounded half-even).
            self._open = handle.getValueState(
                "open",
                "start_us long, last_us long, n_events long, "
                "n_vals long, sum_micros long",
            )

        def _emit(self, user_id, start_us, last_us, n, n_vals, micros, closed_by):
            import pandas as pd

            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                    # All values NULL -> NULL sum, matching the batch
                    # aggregate's SUM semantics (None survives the Arrow
                    # conversion as a SQL NULL).
                    "sum_value": [micros / 1e6 if n_vals > 0 else None],
                    "closed_by": [closed_by],
                }
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            import math

            import pandas as pd

            (user_id,) = key
            # Guard BEFORE concat: pd.concat([]) raises on an exhausted
            # iterator, which made the old empty-batch check dead code
            # (r6 review finding).
            chunks = list(rows)
            if not chunks:
                return
            batch = (
                pd.concat(chunks, ignore_index=True)
                .sort_values(["ts_us", "event_id"])
                .reset_index(drop=True)
            )
            if batch.empty:
                return  # nothing to fold; state and pending timer unchanged
            if self._open.exists():
                start_us, last_us, n, n_vals, micros = self._open.get()
            else:
                start_us = last_us = None
                n = n_vals = micros = 0
            for ts_us, m_v in zip(batch["ts_us"].astype("int64"), batch["micros"]):
                ts_us = int(ts_us)
                # NULL value -> NULL micros -> NaN here; the event still
                # counts and moves the session frontier, but contributes
                # no monetary value (the batch SUM skips NULLs the same
                # way). The old astype('int64') crashed the query on the
                # first NULL (r6 review finding).
                has_v = m_v is not None and not (
                    isinstance(m_v, float) and math.isnan(m_v)
                )
                dv, dn = (int(m_v), 1) if has_v else (0, 0)
                if start_us is None:
                    start_us, last_us = ts_us, ts_us
                    n, n_vals, micros = 1, dn, dv
                elif ts_us - last_us > gap_us:
                    yield self._emit(
                        user_id, start_us, last_us, n, n_vals, micros, "gap"
                    )
                    start_us, last_us = ts_us, ts_us
                    n, n_vals, micros = 1, dn, dv
                else:
                    # Defense-in-depth (delay-0 should make this moot): an
                    # out-of-order event older than the frontier joins the
                    # open session — folding its value, widening start if
                    # needed — but never pulls last_us backward, which
                    # would fake a gap against the NEXT event and emit
                    # sessions with end < start.
                    start_us = min(start_us, ts_us)
                    last_us = max(last_us, ts_us)
                    n, n_vals, micros = n + 1, n_vals + dn, micros + dv
            self._open.update((start_us, last_us, n, n_vals, micros))
            # One pending close-timer per user: re-arm at the new frontier.
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last_us // 1000 + gap_ms)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            (user_id,) = key
            if not self._open.exists():
                return
            start_us, last_us, n, n_vals, micros = self._open.get()
            # Stale timer (events arrived after it was armed): ignore; the
            # current timer for the new frontier is still pending.
            if expiredTimerInfo.getExpiryTimeInMs() < last_us // 1000 + gap_ms:
                return
            yield self._emit(
                user_id, start_us, last_us, n, n_vals, micros, "timer"
            )
            self._open.clear()

        def close(self) -> None:
            pass

    return SessionCloser()


def timer_closed_sessions(
    events: DataFrame, gap_minutes: int = 30, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Streaming gap-sessionization emitting each session exactly once.

    ``events``: streaming DataFrame with (event_id, ts timestamp, user_id,
    value). Requires the session's state store provider to be RocksDB
    (ROCKSDB_PROVIDER) and ``google.protobuf`` in the worker Python (see
    module docstring).

    ``watermark_delay`` must be "0 seconds": the gap-split path emits a
    session the moment a later event lands past the gap, which is only
    final if no late event can subsequently bridge the two sessions —
    true exactly when the watermark admits no late data. Supporting a
    real lateness window needs pending-session state plus merge-on-late
    (not implemented); rejecting the parameter beats silently emitting
    sessions that a bridging late event would invalidate."""
    if watermark_delay.strip() not in ("0 seconds", "0 second"):
        raise ValueError(
            "timer_closed_sessions supports only watermark_delay='0 seconds' "
            "(gap-split emission is final only without late data; "
            "late-merge is not implemented)"
        )
    prepped = events.withWatermark("ts", watermark_delay).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        # Integer micro-units on the batch op's DECIMAL(18,6) grid —
        # HALF_UP like the decimal cast, exact, NULL-preserving.
        (F.col("value").cast("decimal(18,6)") * F.lit(1_000_000))
        .cast("long")
        .alias("micros"),
        "ts",
    )
    return prepped.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_session_closer(gap_minutes),
        outputStructType=_OUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
