"""Structured Streaming sugar over the events stream.

The reference has no streaming model (SURVEY.md §1.4/§2.10 — the engine's
required resumability is checkpointed BATCH via plans/checkpoint.py).
This module is the optional streaming layer the north star leaves room
for: the same tumbling-window aggregation semantics as the batch
`events_window` query, expressed as readStream -> watermark -> window ->
writeStream, so late events beyond the watermark are dropped
deterministically and the sink receives append-mode finalized windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def windowed_counts(
    stream: DataFrame, window: str = "1 day", watermark: str = "1 day"
) -> DataFrame:
    """Tumbling event-time window counts with late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("day"), "event_type", "n")
    )


def run_to_memory(agg: DataFrame, name: str = "events_windows",
                  output_mode: str = "append"):
    """Drain all available input into an in-memory table (tests/demo).

    output_mode='append' (default) exercises the documented watermark
    semantics: only FINALIZED windows (window end <= watermark) are
    emitted, and events later than the watermark are dropped. The
    watermark only advances between micro-batches, so callers who want
    finalized output must feed the source in several batches (e.g.
    maxFilesPerTrigger=1). output_mode='complete' emits running totals
    of every window and never drops late data — use for
    stream-equals-batch comparisons."""
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    return q
