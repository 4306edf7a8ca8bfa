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
            pdf = pdf[pdf["kind"] == "image"].reset_index(drop=True)
            cols = ["media_id", "mean_r", "mean_g", "mean_b", "std_lum", "hist"]
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            ws = pdf["meta"].map(lambda m: m["width"]).to_numpy()
            hs = pdf["meta"].map(lambda m: m["height"]).to_numpy()
            frames = []
            # decode is inherently per-image (real codecs too); the math
            # below is one vectorized pass over the whole (B,h,w,3) stack
            # per same-shape group — no per-row python in the hot path
            for (w, h), idx in pd.DataFrame({"w": ws, "h": hs}).groupby(
                ["w", "h"]
            ).groups.items():
                sub = pdf.loc[idx]
                stack = np.stack(
                    [
                        _decode_rgb(bytes(p), int(w), int(h))
                        for p in sub["payload"]
                    ]
                )
                b = stack.shape[0]
                means = stack.reshape(b, -1, 3).mean(axis=1)
                lum = stack.astype(np.float64).mean(axis=3).reshape(b, -1)
                std = lum.std(axis=1)
                bins = np.minimum((lum / 16.0).astype(np.int64), 15)
                offs = np.arange(b, dtype=np.int64)[:, None] * 16
                hist = np.bincount(
                    (bins + offs).ravel(), minlength=b * 16
                ).reshape(b, 16)
                frames.append(
                    pd.DataFrame(
                        {
                            "media_id": sub["media_id"].to_numpy(),
                            "mean_r": means[:, 0],
                            "mean_g": means[:, 1],
                            "mean_b": means[:, 2],
                            "std_lum": std,
                            "hist": list(hist),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)[cols]

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
            pdf = pdf[pdf["kind"] == "image"].reset_index(drop=True)
            cols = ["media_id", "kind", "payload", "meta"]
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            ws = pdf["meta"].map(lambda m: m["width"]).to_numpy()
            hs = pdf["meta"].map(lambda m: m["height"]).to_numpy()
            frames = []
            for (w, h), idx in pd.DataFrame({"w": ws, "h": hs}).groupby(
                ["w", "h"]
            ).groups.items():
                sub = pdf.loc[idx]
                stack = np.stack(
                    [
                        _decode_rgb(bytes(p), int(w), int(h))
                        for p in sub["payload"]
                    ]
                )
                yi = (np.arange(out_h) * int(h) // out_h).astype(np.int64)
                xi = (np.arange(out_w) * int(w) // out_w).astype(np.int64)
                out = stack[:, yi][:, :, xi]  # one gather for the batch
                frames.append(
                    pd.DataFrame(
                        {
                            "media_id": sub["media_id"].to_numpy(),
                            "kind": "image",
                            "payload": [out[i].tobytes() for i in range(len(sub))],
                            "meta": [
                                {
                                    "width": out_w,
                                    "height": out_h,
                                    "channels": 3,
                                    "sample_rate": int(m["sample_rate"]),
                                }
                                for m in sub["meta"]
                            ],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)[cols]

    return media.mapInPandas(batches, MEDIA_SCHEMA)
