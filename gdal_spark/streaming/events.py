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


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


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


def run_to_memory(agg: DataFrame, name: str = "events_windows"):
    """Drain all available input into an in-memory table (tests/demo)."""
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    return q
