"""Checkpointed stage execution with per-partition lineage + metrics.

North-rule requirement: "every stage checkpoints per-partition to Iceberg
with lineage + row-count/byte metrics so a killed job resumes without
recompute". Semantics modeled on the reference's idempotent tiling resume
(`gdal raster tile --resume` "generate only missing files",
/root/reference/apps/gdalalg_raster_tile.cpp:154): re-running a stage
computes ONLY lineage partitions that have no committed metrics.

This container has no Iceberg catalog, so the store is a directory of
parquet files with the same commit discipline Iceberg gives us (atomic
snapshot += files):

    <root>/<stage>/batch=<n>/part_id=<p>/*.parquet     data
    <root>/<stage>/_metrics/batch-<n>.parquet          lineage commit marker

A batch's data becomes visible ONLY when its metrics file exists (written
after the data write succeeds); a kill mid-batch leaves an orphan data dir
that is ignored and overwritten on resume. Metrics rows carry
(stage, part_id, row_count, bytes, batch, input_snapshot, wall_ms) — the
per-partition lineage record. On a real cluster the same class maps to
`df.writeTo(table).append()` per batch + a lineage table, and the
partition column should be the stage's natural shuffle key (cell bucket,
tile id) so checkpointing adds no extra shuffle: `part_id` is pmod(hash)
of the lineage key, aligned with the join/agg partitioning.
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ state

    def _metrics_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage, "_metrics")

    def metrics(self, spark: SparkSession, stage: str) -> DataFrame | None:
        files = sorted(glob.glob(os.path.join(self._metrics_dir(stage), "batch-*.parquet")))
        if not files:
            return None
        return spark.read.parquet(*files)

    def completed_parts(self, spark: SparkSession, stage: str) -> set[int]:
        m = self.metrics(spark, stage)
        if m is None:
            return set()
        return {r["part_id"] for r in m.select("part_id").distinct().collect()}

    def committed_batches(self, stage: str) -> list[int]:
        return sorted(
            int(os.path.basename(f)[len("batch-") : -len(".parquet")])
            for f in glob.glob(os.path.join(self._metrics_dir(stage), "batch-*.parquet"))
        )

    # ------------------------------------------------------------ run

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        input_df: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        lineage_key: str,
        n_parts: int = 16,
        n_batches: int = 4,
        input_snapshot: str = "",
        fail_after_batches: int | None = None,
    ) -> DataFrame:
        """Run `transform` over `input_df` checkpointed by lineage partition.

        part_id = pmod(xxhash64(lineage_key), n_parts) on the INPUT rows, so
        resume-filtering prunes input before the transform runs (analogous
        to Iceberg partition pruning on the lineage column). Missing parts
        are processed in n_batches commits; each commit = data write then
        metrics write (the visibility point). `fail_after_batches` injects
        a kill for tests. Returns the stage's committed output DataFrame.
        """
        done = self.completed_parts(spark, stage)
        missing = [p for p in range(n_parts) if p not in done]
        part_col = F.pmod(F.xxhash64(F.col(lineage_key)), F.lit(n_parts))
        next_batch = max(self.committed_batches(stage), default=-1) + 1
        groups = [
            missing[i :: n_batches] for i in range(min(n_batches, len(missing)))
        ]
        for bi, parts in enumerate(groups):
            if not parts:
                continue
            if fail_after_batches is not None and bi >= fail_after_batches:
                raise RuntimeError(f"injected failure before batch {bi}")
            t0 = time.time()
            batch_id = next_batch + bi
            sub = input_df.withColumn("part_id", part_col).filter(
                F.col("part_id").isin(parts)
            )
            out = transform(sub)
            if "part_id" not in out.columns:
                raise ValueError("transform must preserve the part_id column")
            data_dir = os.path.join(self.root, stage, f"batch={batch_id}")
            out.write.mode("overwrite").partitionBy("part_id").parquet(data_dir)
            wall_ms = int((time.time() - t0) * 1000)
            written = spark.read.parquet(data_dir)
            rows = written.groupBy("part_id").count().collect()
            sizes = {
                p: sum(
                    os.path.getsize(f)
                    for f in glob.glob(os.path.join(data_dir, f"part_id={p}", "*.parquet"))
                )
                for p in parts
            }
            counts = {r["part_id"]: r["count"] for r in rows}
            metrics_rows = [
                (stage, int(p), int(counts.get(p, 0)), int(sizes.get(p, 0)),
                 batch_id, input_snapshot, wall_ms)
                for p in parts
            ]
            mdf = spark.createDataFrame(
                metrics_rows,
                "stage string, part_id int, row_count long, bytes long, "
                "batch int, input_snapshot string, wall_ms long",
            )
            os.makedirs(self._metrics_dir(stage), exist_ok=True)
            tmp = os.path.join(self._metrics_dir(stage), f".batch-{batch_id}.tmp")
            mdf.toPandas().to_parquet(tmp)
            os.replace(tmp, os.path.join(self._metrics_dir(stage), f"batch-{batch_id}.parquet"))
        return self.load(spark, stage)

    def load(self, spark: SparkSession, stage: str) -> DataFrame:
        """Committed output only: union of batch dirs that have metrics."""
        batches = self.committed_batches(stage)
        dirs = [
            os.path.join(self.root, stage, f"batch={b}")
            for b in batches
            if os.path.isdir(os.path.join(self.root, stage, f"batch={b}"))
        ]
        if not dirs:
            raise FileNotFoundError(f"no committed batches for stage {stage}")
        return spark.read.option("basePath", self.root).parquet(*dirs)

    def lineage_report(self, spark: SparkSession, stage: str) -> dict:
        m = self.metrics(spark, stage)
        if m is None:
            return {"stage": stage, "parts": 0, "rows": 0, "bytes": 0}
        agg = m.agg(
            F.countDistinct("part_id").alias("parts"),
            F.sum("row_count").alias("rows"),
            F.sum("bytes").alias("bytes"),
        ).collect()[0]
        return {
            "stage": stage,
            "parts": int(agg["parts"]),
            "rows": int(agg["rows"]),
            "bytes": int(agg["bytes"]),
        }
