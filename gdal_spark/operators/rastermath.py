"""Per-pixel raster pipeline steps as JVM higher-order functions.

The `gdal raster pipeline` step registry
(/root/reference/apps/gdalalg_raster_pipeline.cpp:145) includes scale,
reclassify and color-map as per-pixel value maps; the reference executes
them as VRT pixel functions / driver loops
(frmts/vrt/pixelfunctions.cpp, apps/gdalalg_raster_color_map.cpp,
apps/gdalalg_raster_reclassify.cpp). Over the block-raster model each is
one `transform()` lambda on the block array — stays in the JVM, no
shuffle, composes lazily like VRT steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scale_blocks(blocks: DataFrame, a: float, b: float) -> DataFrame:
    """out = in * a + b (gdal raster scale / pixelfunctions 'scale')."""
    return blocks.withColumn(
        "block", F.expr(f"transform(block, x -> x * CAST({a!r} AS DOUBLE) + CAST({b!r} AS DOUBLE))")
    )


def reclassify_blocks(blocks: DataFrame, ranges) -> DataFrame:
    """ranges: list of (lo, hi, value) — first matching [lo, hi) wins,
    unmatched pixels pass through (gdal raster reclassify PASS_THROUGH
    default)."""
    whens = " ".join(
        f"WHEN x >= CAST({lo!r} AS DOUBLE) AND x < CAST({hi!r} AS DOUBLE) "
        f"THEN CAST({v!r} AS DOUBLE)"
        for lo, hi, v in ranges
    )
    return blocks.withColumn(
        "block", F.expr(f"transform(block, x -> CASE {whens} ELSE x END)")
    )


def mosaic_blocks(sources, nodata: float) -> DataFrame:
    """`gdal raster mosaic` (apps/gdalalg_raster_mosaic.cpp): combine
    same-grid rasters, first-valid-pixel-wins in source order (the
    reference's VRT composition order). sources: list of block
    DataFrames (bx, by, w, h, block). One union + one groupBy; the
    per-key combine is a numpy pass over the few overlapping blocks."""
    import numpy as np
    import pandas as pd

    tagged = None
    for pri, src in enumerate(sources):
        t = src.withColumn("_pri", F.lit(pri))
        tagged = t if tagged is None else tagged.unionByName(t)

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_pri")
        first = pdf.iloc[0]
        out = np.full(int(first["w"]) * int(first["h"]), float(nodata))
        for _, r in pdf.iterrows():
            arr = np.asarray(r["block"], dtype=np.float64)
            fill = out == nodata
            out[fill] = arr[fill]
        return pd.DataFrame(
            {
                "bx": [int(first["bx"])], "by": [int(first["by"])],
                "w": [int(first["w"])], "h": [int(first["h"])],
                "block": [out],
            }
        )

    return tagged.groupBy("bx", "by").applyInPandas(
        combine, "bx int, by int, w int, h int, block array<double>"
    )


def color_map_blocks(blocks: DataFrame, stops) -> DataFrame:
    """stops: sorted list of (threshold, r, g, b); each pixel takes the
    color of the LAST stop with threshold <= value (gdaldem color-relief
    'nearest below' discrete mode). Adds block_r/g/b byte arrays."""
    out = blocks
    for ci, name in enumerate(("block_r", "block_g", "block_b")):
        whens = " ".join(
            f"WHEN x >= CAST({t!r} AS DOUBLE) THEN CAST({rgb[ci]} AS DOUBLE)"
            for t, *rgb in reversed(stops)
        )
        out = out.withColumn(
            name, F.expr(f"transform(block, x -> CASE {whens} ELSE 0.0 END)")
        )
    return out
