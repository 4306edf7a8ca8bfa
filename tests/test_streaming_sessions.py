"""Stateful streaming sessionization (applyInPandasWithState): sessions
closed by the GAP rule when later events arrive must equal the batch
ground truth. (The idle-timeout close path needs the engine to schedule
wake-up batches on a quiet source — not exercised here; gap closure is
the deterministic contract.)"""

import datetime as dt

from pyspark.sql import functions as F

from gdal_spark.streaming.events import EVENTS_SCHEMA
from gdal_spark.streaming.sessions import sessionize_batch, sessionize_stream


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, "e", 1.0, "{}") for i, (uid, ts) in enumerate(rows)],
        EVENTS_SCHEMA,
    )


def test_stream_gap_closure_matches_batch(spark, tmp_path):
    stream_dir = str(tmp_path / "sess_in")
    t0 = dt.datetime(2026, 3, 1, 8, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # batch 1: two users, two sessions' worth of early events
    b1 = [(1, m(0)), (1, m(10)), (1, m(20)), (2, m(5)), (2, m(15))]
    # batch 2: events far beyond the 30-min gap -> closes batch-1 sessions
    b2 = [(1, m(120)), (2, m(180)), (1, m(125))]
    _mk(spark, b1).coalesce(1).write.mode("append").parquet(stream_dir)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    out = sessionize_stream(stream, gap_seconds=1800.0, idle_timeout_ms=60000)
    q = (
        out.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .start()
    )
    import time

    def _poll(pred, deadline_s=120):
        end = time.time() + deadline_s
        while time.time() < end:
            if pred():
                return True
            time.sleep(1.0)
        return False

    try:
        # processAllAvailable never settles while processing-time
        # timeouts are pending (the engine keeps scheduling cleanup
        # batches) — poll progress instead
        assert _poll(
            lambda: any(
                p["numInputRows"] >= len(b1) for p in (q.recentProgress or [])
            )
        ), "batch 1 not consumed"
        _mk(spark, b2).coalesce(1).write.mode("append").parquet(stream_dir)
        assert _poll(
            lambda: spark.sql("SELECT COUNT(*) c FROM t_sessions").collect()[0]["c"]
            >= 2
        ), "gap-closed sessions not emitted"
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql("SELECT * FROM t_sessions").collect()
        }
    finally:
        q.stop()

    # expected: the CLOSED sessions = batch sessions minus each user's
    # final (still-open) session
    all_events = _mk(spark, b1 + b2)
    batch = sessionize_batch(all_events, gap_seconds=1800.0)
    w_last = batch.groupBy("user_id").agg(F.max("session_start").alias("last_start"))
    closed = batch.join(w_last, "user_id").filter(
        F.col("session_start") < F.col("last_start")
    )
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed.collect()
    }
    assert got == expect
    assert len(expect) == 2  # one closed session per user
