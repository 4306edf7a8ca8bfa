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


def unscale_blocks(blocks: DataFrame, scale: float, offset: float) -> DataFrame:
    """`gdal raster unscale` (apps/gdalalg_raster_unscale.cpp): apply the
    band's Scale/Offset metadata — out = raw * scale + offset — so the
    stored integer codes become physical values. Same transform() shape
    as scale_blocks but with the band-metadata semantics."""
    return blocks.withColumn(
        "block",
        F.expr(
            f"transform(block, x -> x * CAST({scale!r} AS DOUBLE) "
            f"+ CAST({offset!r} AS DOUBLE))"
        ),
    )


_TYPE_LIMITS = {
    # GDALGetDataLimits (gcore/gdal_priv_templates.hpp): (min, max, signed)
    "Byte": (0.0, 255.0, False),
    "UInt16": (0.0, 65535.0, False),
    "Int16": (-32768.0, 32767.0, True),
    "Int32": (-2147483648.0, 2147483647.0, True),
}


def set_type_blocks(blocks: DataFrame, dtype: str) -> DataFrame:
    """`gdal raster set-type` with GDALCopyWord conversion semantics
    (gcore/gdal_priv_templates.hpp:650-700): signed ints round half AWAY
    from zero (x>0 ? x+0.5 : x-0.5, clamp, truncate), unsigned ints add
    0.5 then clamp then truncate, Float32 is a precision-dropping cast.
    Values stay in the double block payload (the engine's working type),
    exactly representing every integral/float32 result."""
    if dtype == "Float32":
        return blocks.withColumn(
            "block",
            F.expr("transform(block, x -> CAST(CAST(x AS FLOAT) AS DOUBLE))"),
        )
    mn, mx, signed = _TYPE_LIMITS[dtype]
    rounded = (
        "CASE WHEN x > CAST(0 AS DOUBLE) THEN x + 0.5 ELSE x - 0.5 END"
        if signed
        else "x + 0.5"
    )
    return blocks.withColumn(
        "block",
        F.expr(
            # CAST(double AS BIGINT) truncates toward zero == static_cast
            f"transform(block, x -> CAST(CAST(LEAST(GREATEST({rounded}, "
            f"CAST({mn!r} AS DOUBLE)), CAST({mx!r} AS DOUBLE)) AS BIGINT) AS DOUBLE))"
        ),
    )


def stack_blocks(sources) -> DataFrame:
    """`gdal raster stack` (apps/gdalalg_raster_stack.cpp): combine
    same-grid single-band rasters into one multi-band block table —
    (bx, by, w, h, block_1..block_n). Pure equi-join on block keys, no
    Python; bands stay co-partitioned for downstream zip_with math."""
    out = None
    for i, src in enumerate(sources, start=1):
        s = src.withColumnRenamed("block", f"block_{i}")
        if out is None:
            out = s
        else:
            out = out.join(s, ["bx", "by", "w", "h"])
    return out


def pansharpen_blocks(
    pan: DataFrame, spectral, weights=None
) -> DataFrame:
    """Weighted-Brovey pansharpening (alg/gdalpansharpen.cpp:601
    WeightedBrovey): pseudo_pan = sum_i w_i * spectral_i,
    factor = pan / pseudo_pan (0 when pseudo_pan == 0, ComputeFactor
    :576), out_i = spectral_i * factor. Inputs must share the grid (the
    reference upsamples spectral bands to the pan grid first — compose
    with resize()). All JVM zip_with lambdas, zero Python."""
    n = len(spectral)
    if weights is None:
        weights = [1.0 / n] * n
    stacked = stack_blocks([pan] + list(spectral))  # block_1 = pan
    pseudo = "transform(block_1, x -> CAST(0 AS DOUBLE))"
    for i, w in enumerate(weights, start=2):
        pseudo = (
            f"zip_with({pseudo}, block_{i}, "
            f"(a, s) -> a + CAST({w!r} AS DOUBLE) * s)"
        )
    stacked = stacked.withColumn(
        "factor",
        F.expr(
            f"zip_with(block_1, {pseudo}, "
            "(p, ps) -> CASE WHEN ps = CAST(0 AS DOUBLE) "
            "THEN CAST(0 AS DOUBLE) ELSE p / ps END)"
        ),
    )
    cols = ["bx", "by", "w", "h"]
    out_cols = [F.col(c) for c in cols]
    for i in range(2, n + 2):
        out_cols.append(
            F.expr(f"zip_with(block_{i}, factor, (s, f) -> s * f)").alias(
                f"block_{i - 1}"
            )
        )
    return stacked.select(*out_cols)


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
