"""Structured Streaming layer: stream==batch (complete mode) and
append-mode watermark semantics (finalized windows only; late drop)."""

import datetime as dt

from pyspark.sql import functions as F

from gdal_spark.streaming.events import events_stream, run_to_memory, windowed_counts


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    # stage the events parquet into a stream-source dir
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream_dir = str(tmp_path / "events_in")
    src.write.parquet(stream_dir)

    agg = windowed_counts(events_stream(spark, stream_dir))
    q = run_to_memory(agg, "t_events_windows", output_mode="complete")
    try:
        got = {
            (r["day"], r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM t_events_windows").collect()
        }
    finally:
        q.stop()

    batch = (
        src.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expect = {(r["day"], r["event_type"]): r["n"] for r in batch}
    assert got == expect
    assert len(got) > 0


def test_append_mode_drops_late_and_emits_finalized(spark, tmp_path):
    """Watermark semantics: feed 3 files as 3 micro-batches. File 2's max
    event time pushes the watermark past day-1, finalizing it; file 3
    holds one LATE day-1 event (older than the watermark) which must be
    dropped from the append-mode output."""
    stream_dir = str(tmp_path / "late_in")

    def write_file(rows, name):
        df = spark.createDataFrame(
            [(i, ts, 1, et, 1.0, "{}") for i, (ts, et) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        df.coalesce(1).write.mode("append").parquet(stream_dir)

    d1 = dt.datetime(2026, 1, 1, 12, 0)
    d2 = dt.datetime(2026, 1, 3, 12, 0)  # advances watermark to Jan 2 12:00
    write_file([(d1, "click"), (d1, "click")], "f1")

    agg = windowed_counts(events_stream(spark, stream_dir, max_files_per_trigger=1))
    q = run_to_memory(agg, "t_late_windows", output_mode="append")
    try:
        write_file([(d2, "view")], "f2")
        q.processAllAvailable()
        # late: day-1 event arriving after watermark passed day-1's window
        write_file([(d1, "click"), (d2, "view")], "f3")
        q.processAllAvailable()
        got = {
            (r["day"].date(), r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM t_late_windows").collect()
        }
    finally:
        q.stop()

    # day-1 finalized with the 2 on-time clicks; the late third click was
    # dropped. day-3 never finalizes (watermark hasn't passed it).
    assert got == {(dt.date(2026, 1, 1), "click"): 2}
