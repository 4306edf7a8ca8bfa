"""Structured Streaming layer: stream results == batch results."""

from pyspark.sql import functions as F

from gdal_spark.streaming.events import events_stream, run_to_memory, windowed_counts


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    # stage the events parquet into a stream-source dir
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream_dir = str(tmp_path / "events_in")
    src.write.parquet(stream_dir)

    agg = windowed_counts(events_stream(spark, stream_dir))
    q = run_to_memory(agg, "t_events_windows")
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
