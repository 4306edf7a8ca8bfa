"""Multimodal (image/audio) column operators with REAL stdlib codecs.

Media travel as opaque `binary` columns plus a typed metadata struct —
exactly how the engine treats raster tiles (SURVEY.md §1.1) and how the
reference treats pixel buffers (typed C arrays + band metadata;
gcore/rasterio.cpp). Decode is real: PNG (stdlib zlib + numpy
unfiltering), BMP and 16-bit PCM WAV (struct parsing) via
gdal_spark.kernels.codecs — the same formats the reference reads through
frmts/png/pngdataset.cpp and frmts/bmp/bmpdataset.cpp. Formats needing
external codec libraries (JPEG/ffmpeg) raise ValueError loudly, like the
reference's driver Identify failure path.

All stages are mapInPandas over Arrow batches: per-batch numpy work
around an inherently per-item decode loop (real codecs decode one
container at a time — so does libpng), and binary payloads never pass
through the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.kernels import codecs

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int>"
)


def pattern_rgb(media_id: int, width: int, height: int) -> np.ndarray:
    """Deterministic test pixels: byte at flat offset p*3+c is
    (media_id*31 + p*3 + c) mod 256 — closed-form, so an independent SQL
    oracle can recompute every pixel without running any codec."""
    flat = np.arange(height * width * 3, dtype=np.int64)
    return ((media_id * 31 + flat) % 256).astype(np.uint8).reshape(
        height, width, 3
    )


def pattern_pcm(media_id: int, n_frames: int, channels: int) -> np.ndarray:
    """Deterministic test samples: interleaved value i is
    ((media_id*7919 + i*31) mod 4001) - 2000, int16."""
    flat = np.arange(n_frames * channels, dtype=np.int64)
    return (((media_id * 7919 + flat * 31) % 4001) - 2000).astype(
        np.int16
    ).reshape(n_frames, channels)


def synth_media(
    spark,
    n: int,
    width: int = 32,
    height: int = 24,
    n_frames: int = 256,
    channels: int = 2,
    sample_rate: int = 16000,
) -> DataFrame:
    """Deterministic synthetic media table with REAL encoded payloads.

    media_id % 3 == 0 -> PNG (mixed row filters 0..4, so decode exercises
    every unfilter path), == 1 -> BMP, == 2 -> 16-bit PCM WAV. Encoding
    happens executor-side in mapInPandas; the driver never sees payloads.
    """
    ids = spark.range(0, n).withColumnRenamed("id", "media_id")
    return encode_media(
        ids,
        width=width,
        height=height,
        n_frames=n_frames,
        channels=channels,
        sample_rate=sample_rate,
    )


def encode_media(
    ids: DataFrame,
    width: int = 32,
    height: int = 24,
    n_frames: int = 256,
    channels: int = 2,
    sample_rate: int = 16000,
) -> DataFrame:
    """(media_id) -> MEDIA_SCHEMA rows with real PNG/BMP/WAV payloads
    built from the closed-form pattern_* generators."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf["media_id"].astype(np.int64):
                mid = int(mid)
                mod = mid % 3
                if mod == 2:
                    pcm = pattern_pcm(mid, n_frames, channels)
                    payload = codecs.encode_wav(pcm, sample_rate)
                    kind = "audio"
                    w = h = 0
                    ch = channels
                else:
                    px = pattern_rgb(mid, width, height)
                    payload = (
                        codecs.encode_png(px, filter_mode="mixed")
                        if mod == 0
                        else codecs.encode_bmp(px)
                    )
                    kind = "image"
                    w, h, ch = width, height, 3
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "channels": ch,
                            "sample_rate": sample_rate,
                        },
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return ids.select("media_id").mapInPandas(batches, MEDIA_SCHEMA)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + per-channel mean/sum + 16-bin luminance histogram.

    mapInPandas: one Arrow batch in, one out; decode is per-image (real
    containers decode one at a time), the statistics are one vectorized
    pass over the whole (B, h, w, 3) stack per same-shape group.
    Output: media_id, mean_r/g/b, sum_r/g/b, std_lum, hist[16].
    """

    cols = [
        "media_id",
        "mean_r",
        "mean_g",
        "mean_b",
        "sum_r",
        "sum_g",
        "sum_b",
        "std_lum",
        "hist",
    ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "image"].reset_index(drop=True)
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            decoded = [codecs.decode_image(bytes(p)) for p in pdf["payload"]]
            shapes = pd.DataFrame(
                {"h": [d.shape[0] for d in decoded], "w": [d.shape[1] for d in decoded]}
            )
            frames = []
            for (_h, _w), idx in shapes.groupby(["h", "w"]).groups.items():
                idx = list(idx)
                stack = np.stack([decoded[i] for i in idx])
                b = stack.shape[0]
                flat = stack.reshape(b, -1, 3)
                sums = flat.astype(np.int64).sum(axis=1)
                means = flat.mean(axis=1)
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
                            "media_id": pdf["media_id"].iloc[idx].to_numpy(),
                            "mean_r": means[:, 0],
                            "mean_g": means[:, 1],
                            "mean_b": means[:, 2],
                            "sum_r": sums[:, 0],
                            "sum_g": sums[:, 1],
                            "sum_b": sums[:, 2],
                            "std_lum": std,
                            "hist": list(hist),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)[cols]

    return media.mapInPandas(
        batches,
        "media_id long, mean_r double, mean_g double, mean_b double, "
        "sum_r long, sum_g long, sum_b long, std_lum double, "
        "hist array<long>",
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV payloads + per-channel integer statistics.

    Output one row per (media_id, channel): n_samp, sum_v, sum_sq
    (int64 — 16-bit samples cannot overflow it), min_v, max_v,
    sample_rate. All-integer so any single byte error in the codec path
    changes the result.
    """

    cols = [
        "media_id",
        "channel",
        "n_samp",
        "sum_v",
        "sum_sq",
        "min_v",
        "max_v",
        "sample_rate",
    ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "audio"].reset_index(drop=True)
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr, rate = codecs.decode_wav(bytes(payload))
                a = arr.astype(np.int64)
                for ch in range(a.shape[1]):
                    v = a[:, ch]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "channel": ch,
                            "n_samp": v.size,
                            "sum_v": int(v.sum()),
                            "sum_sq": int((v * v).sum()),
                            "min_v": int(v.min()),
                            "max_v": int(v.max()),
                            "sample_rate": rate,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        batches,
        "media_id long, channel int, n_samp long, sum_v long, "
        "sum_sq long, min_v long, max_v long, sample_rate int",
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decoded frames (same index math as the
    warp kernel's GRA_NearestNeighbour, gdalwarpkernel.cpp) — returns
    PNG-re-encoded payloads with updated meta, so resize output is itself
    a decodable image."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "image"].reset_index(drop=True)
            cols = ["media_id", "kind", "payload", "meta"]
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            decoded = [codecs.decode_image(bytes(p)) for p in pdf["payload"]]
            shapes = pd.DataFrame(
                {"h": [d.shape[0] for d in decoded], "w": [d.shape[1] for d in decoded]}
            )
            frames = []
            for (h, w), idx in shapes.groupby(["h", "w"]).groups.items():
                idx = list(idx)
                stack = np.stack([decoded[i] for i in idx])
                yi = (np.arange(out_h) * int(h) // out_h).astype(np.int64)
                xi = (np.arange(out_w) * int(w) // out_w).astype(np.int64)
                out = stack[:, yi][:, :, xi]  # one gather for the batch
                sub = pdf.iloc[idx]
                frames.append(
                    pd.DataFrame(
                        {
                            "media_id": sub["media_id"].to_numpy(),
                            "kind": "image",
                            "payload": [
                                codecs.encode_png(out[i], filter_mode="none")
                                for i in range(len(idx))
                            ],
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
