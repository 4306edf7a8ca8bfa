"""Distributed contour extraction (marching squares over block rasters).

The reference's contour generator (/root/reference/alg/contour.cpp +
alg/marching_squares/) walks the raster sequentially; here each block
emits the segments of the squares whose top-left node it owns, using a
1-node halo from its right/bottom/diagonal neighbors (same exchange
pattern as the focal ops — NaN-padded, so halo-incomplete squares are
suppressed on the block that doesn't own them and produced exactly once
by the block that does). Output: georeferenced segment soup
(level, x1, y1, x2, y2); polyline stitching is a driver-side
concatenation like polygonize's component merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.contour import contour_segments
from ..kernels.geotransform import apply_geotransform
from .raster import RasterMeta


def contour(blocks: DataFrame, meta: RasterMeta, levels: list[float]) -> DataFrame:
    """Marching-squares segments for each level, georeferenced via the
    raster geotransform. One shuffle (halo exchange)."""
    bs = meta.block
    nbx, nby = meta.nbx, meta.nby
    width, height = meta.width, meta.height
    gt = meta.gt

    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (0, -1)
            for dx in (0, -1)
        ]
    )
    contrib = (
        blocks.withColumn("o", F.explode(offsets))
        .select(
            (F.col("bx") + F.col("o.dx")).alias("tbx"),
            (F.col("by") + F.col("o.dy")).alias("tby"),
            "bx", "by", "w", "h", "block",
        )
        .filter(
            (F.col("tbx") >= 0) & (F.col("tbx") < nbx)
            & (F.col("tby") >= 0) & (F.col("tby") < nby)
        )
    )

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        tbx = int(pdf["tbx"].iloc[0])
        tby = int(pdf["tby"].iloc[0])
        dw = min(bs, width - tbx * bs)
        dh = min(bs, height - tby * bs)
        pad = np.full((dh + 1, dw + 1), np.nan)
        x0g, y0g = tbx * bs, tby * bs
        for _, r in pdf.iterrows():
            arr = np.asarray(r["block"], dtype=np.float64).reshape(r["h"], r["w"])
            bx0, by0 = r["bx"] * bs, r["by"] * bs
            ix0, iy0 = max(bx0, x0g), max(by0, y0g)
            ix1 = min(bx0 + r["w"], x0g + dw + 1)
            iy1 = min(by0 + r["h"], y0g + dh + 1)
            if ix1 <= ix0 or iy1 <= iy0:
                continue
            pad[iy0 - y0g : iy1 - y0g, ix0 - x0g : ix1 - x0g] = arr[
                iy0 - by0 : iy1 - by0, ix0 - bx0 : ix1 - bx0
            ]
        rows = []
        for level in levels:
            segs = contour_segments(pad, level, x_off=x0g, y_off=y0g)
            if len(segs) == 0:
                continue
            gx1, gy1 = apply_geotransform(gt, segs[:, 0], segs[:, 1])
            gx2, gy2 = apply_geotransform(gt, segs[:, 2], segs[:, 3])
            for a, b, c, d in zip(gx1, gy1, gx2, gy2):
                rows.append((float(level), float(a), float(b), float(c), float(d)))
        return pd.DataFrame(
            rows, columns=["level", "x1", "y1", "x2", "y2"]
        )

    return contrib.groupBy("tbx", "tby").applyInPandas(
        emit, "level double, x1 double, y1 double, x2 double, y2 double"
    )
