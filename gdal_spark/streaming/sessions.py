"""Custom stateful streaming operator: event sessionization.

The reference has no streaming model (SURVEY.md §2.10); this is the
engine's `applyInPandasWithState` surface from the task brief — a
gap-timeout sessionizer: consecutive events of a user belong to one
session while gaps stay under `gap`; a session closes (and emits) when
the processing-time timeout fires after the stream goes quiet for that
user. State per user = (session_start, last_ts, n_events).

Batch equivalence: `sessionize_batch` computes identical sessions with
window functions (gap flags -> session ids -> aggregates); the stream
and batch paths are compared in tests/test_streaming_sessions.py.

Caveats: (a) the state function MUST drain pdf_iter even in the
timed-out branch or the Arrow stream protocol deadlocks; (b) while
processing-time timeouts are pending, the engine keeps scheduling
state-cleanup micro-batches, so `processAllAvailable()` never settles —
callers poll progress/output instead.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "session_start double, last_ts double, n_events long"


def sessionize_stream(
    events: DataFrame, gap_seconds: float = 1800.0, idle_timeout_ms: int = 2000
) -> DataFrame:
    """events stream: (user_id, ts, ...). Emits CLOSED sessions."""

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            for _ in pdf_iter:  # MUST drain (Arrow stream protocol)
                pass
            if state.exists:
                s0, s1, n = state.get
                rows.append(
                    (
                        user_id,
                        dt.datetime.utcfromtimestamp(s0),
                        dt.datetime.utcfromtimestamp(s1),
                        int(n),
                    )
                )
                state.remove()
        else:
            if state.exists:
                s0, s1, n = state.get
            else:
                s0 = s1 = None
            ts_all = []
            for pdf in pdf_iter:
                ts_all.extend(
                    t.timestamp() for t in pd.to_datetime(pdf["ts"]).tolist()
                )
            for t in sorted(ts_all):
                if s0 is None:
                    s0, s1, n = t, t, 1
                elif t - s1 <= gap_seconds:
                    s1, n = max(s1, t), n + 1
                else:
                    rows.append(
                        (
                            user_id,
                            dt.datetime.utcfromtimestamp(s0),
                            dt.datetime.utcfromtimestamp(s1),
                            int(n),
                        )
                    )
                    s0, s1, n = t, t, 1
            if s0 is not None:
                state.update((float(s0), float(s1), int(n)))
                state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Batch ground truth: gap flags -> running session index -> agg."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = (
        F.col("ts").cast("double")
        - F.lag(F.col("ts").cast("double")).over(w)
    )
    d = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    ).withColumn("_sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        d.groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sid")
    )
