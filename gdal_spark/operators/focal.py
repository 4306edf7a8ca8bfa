"""Distributed focal (neighborhood) raster ops with halo exchange.

The reference's DEM processors (apps/gdaldem_lib.cpp, registered as
pipeline steps hillshade/slope/aspect/tri/tpi/roughness,
apps/gdalalg_raster_pipeline.cpp:145) are 3x3 sliding-window kernels.
Distributed form (SURVEY.md §2.5): each block needs a 1-pixel halo from
its 8 neighbors —

  1. every block replicates itself to its 3x3 neighborhood keys
     (explode — 9x small-row duplication, shuffle on block keys);
  2. groupBy target block + applyInPandas assembles the padded
     (h+2, w+2) array and runs the numpy kernel (kernels/dem.py);
  3. raster-boundary pixels produce nodata (reference default: no
     compute_edges).

One shuffle per focal op; halo volume is 8*(block_size+2)^2 per block —
negligible against block payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import dem as DEM
from .raster import RasterMeta

_KERNELS = {
    "hillshade": lambda p, meta, kw: DEM.hillshade(
        p, meta.gt[1], meta.gt[5], kw.get("z", 1.0), kw.get("alt", 45.0),
        kw.get("az", 315.0)),
    "slope": lambda p, meta, kw: DEM.slope(
        p, meta.gt[1], meta.gt[5], kw.get("percent", False)),
    "aspect": lambda p, meta, kw: DEM.aspect(p, kw.get("azimuth", True)),
    "tri": lambda p, meta, kw: DEM.tri(p),
    "tpi": lambda p, meta, kw: DEM.tpi(p),
    "roughness": lambda p, meta, kw: DEM.roughness(p),
}


def focal(blocks: DataFrame, meta: RasterMeta, op: str, **kw) -> DataFrame:
    """Apply a 3x3 focal op to a block raster; returns dst block rows."""
    if op not in _KERNELS:
        raise ValueError(f"unknown focal op {op}; have {sorted(_KERNELS)}")
    kernel = _KERNELS[op]
    bs = meta.block
    nodata = float(meta.nodata)
    width, height = meta.width, meta.height
    nbx, nby = meta.nbx, meta.nby

    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
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

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        tbx = int(pdf["tbx"].iloc[0])
        tby = int(pdf["tby"].iloc[0])
        dw = min(bs, width - tbx * bs)
        dh = min(bs, height - tby * bs)
        pad = np.full((dh + 2, dw + 2), nodata, dtype=np.float64)
        x0g = tbx * bs - 1
        y0g = tby * bs - 1
        for _, r in pdf.iterrows():
            arr = np.array(r["block"], dtype=np.float64).reshape(r["h"], r["w"])
            bx0, by0 = r["bx"] * bs, r["by"] * bs
            # intersection of this block with the padded window
            ix0 = max(bx0, x0g)
            iy0 = max(by0, y0g)
            ix1 = min(bx0 + r["w"], x0g + dw + 2)
            iy1 = min(by0 + r["h"], y0g + dh + 2)
            if ix1 <= ix0 or iy1 <= iy0:
                continue
            pad[iy0 - y0g : iy1 - y0g, ix0 - x0g : ix1 - x0g] = arr[
                iy0 - by0 : iy1 - by0, ix0 - bx0 : ix1 - bx0
            ]
        out = kernel(pad, meta, kw).astype(np.float64)
        # raster-boundary pixels -> nodata (no compute_edges, ref default)
        if tbx == 0:
            out[:, 0] = nodata
        if tby == 0:
            out[0, :] = nodata
        if tbx * bs + dw >= width:
            out[:, dw - 1] = nodata
        if tby * bs + dh >= height:
            out[dh - 1, :] = nodata
        return pd.DataFrame(
            {
                "bx": [tbx], "by": [tby], "w": [dw], "h": [dh],
                "block": [out.ravel().tolist()],
            }
        )

    return contrib.groupBy("tbx", "tby").applyInPandas(
        assemble, "bx int, by int, w int, h int, block array<double>"
    )
