"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns plus a typed metadata struct —
exactly how the engine treats raster tiles (SURVEY.md §1.1) and how the
reference treats pixel buffers (typed C arrays + band metadata). The
decode step itself is STUBBED (no image/audio libs in this container):
`decode_image` runs a deterministic fake decoder so every downstream
stage — schema, Arrow batch shape, partitioning, mapInPandas signature —
is real and tested; swap `_decode_rgb` for a real decoder (PIL/ffmpeg)
in production.

All stages are mapInPandas over Arrow batches: per-batch numpy work, no
per-row Python, and binary payloads never pass through the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int>"
)

_STUB = True  # no codec libraries in this environment


def _decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from payload bytes.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload)).
    The fake keeps (h, w, 3) uint8 shape and full determinism so plumbing
    tests (shapes, batching, aggregation) are faithful.
    """
    if not _STUB:
        raise NotImplementedError("real image decode requires PIL/libjpeg")
    raw = np.frombuffer(payload, dtype=np.uint8)
    n = width * height * 3
    reps = -(-n // max(len(raw), 1))
    return np.tile(raw, reps)[:n].reshape(height, width, 3)


def synth_media(spark, n: int, width: int = 32, height: int = 24) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    df = spark.range(0, n).withColumnRenamed("id", "media_id")
    return df.select(
        "media_id",
        F.when(F.col("media_id") % 3 == 0, "image").otherwise("audio").alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.col("media_id").cast("string")), "UTF-8"
        ).alias("payload"),
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(3).cast("int").alias("channels"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def image_features(media: DataFrame) -> DataFrame:
    """Decode + per-channel mean/std + 16-bin luminance histogram.

    mapInPandas: one Arrow batch in, one out; all numpy inside.
    Output: media_id, mean_r/g/b, std_lum, hist (array<long>[16]).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                if row["kind"] != "image":
                    continue
                m = row["meta"]
                img = _decode_rgb(bytes(row["payload"]), m["width"], m["height"])
                lum = img.astype(np.float64).mean(axis=2)
                hist, _ = np.histogram(lum, bins=16, range=(0, 256))
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                        "std_lum": float(lum.std()),
                        "hist": hist.astype(np.int64).tolist(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "mean_r", "mean_g", "mean_b", "std_lum", "hist"],
            )

    return media.mapInPandas(
        batches,
        "media_id long, mean_r double, mean_g double, mean_b double, "
        "std_lum double, hist array<long>",
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decoded frames (same index math as the
    warp kernel's GRA_NearestNeighbour, gdalwarpkernel.cpp) — returns
    re-encoded raw RGB payloads with updated meta."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                if row["kind"] != "image":
                    continue
                m = row["meta"]
                img = _decode_rgb(bytes(row["payload"]), m["width"], m["height"])
                yi = (np.arange(out_h) * m["height"] // out_h).astype(np.int64)
                xi = (np.arange(out_w) * m["width"] // out_w).astype(np.int64)
                out = img[yi][:, xi]
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "kind": "image",
                        "payload": out.tobytes(),
                        "meta": {
                            "width": out_w,
                            "height": out_h,
                            "channels": 3,
                            "sample_rate": m["sample_rate"],
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return media.mapInPandas(batches, MEDIA_SCHEMA)
