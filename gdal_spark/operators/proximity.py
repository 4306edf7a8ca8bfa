"""Proximity raster: per-pixel distance to the nearest target pixel.

Re-expresses GDALComputeProximity (/root/reference/alg/gdalproximity.cpp,
DISTUNITS=PIXEL, MAXDIST): for every pixel of the output window, the
euclidean pixel distance to the closest target pixel, up to `maxdist`
(pixels beyond it take the reference's nodata behavior — here: omitted).

The engine computes EXACT euclidean distances by composing the gridding
neighborhood join (operators/gridding.py): targets bucket into
maxdist-sized cells, window pixels probe their 3x3 bucket neighborhood,
one hash join + min aggregation — all codegen, no scanline state (the
reference's two-pass scan is a sequential approximation of the same
metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gridding import grid_nearest


def proximity(
    targets: DataFrame,
    gx0: int,
    gy0: int,
    nx: int,
    ny: int,
    maxdist: float,
    gx_col: str = "gx",
    gy_col: str = "gy",
) -> DataFrame:
    """targets: rows with global pixel coords. Output: (gx, gy, d2, dist)
    for every window pixel within maxdist of a target (d2 = squared
    pixel distance, integer-exact)."""
    pts = targets.select(
        F.col(gx_col).cast("double").alias("x"),
        F.col(gy_col).cast("double").alias("y"),
        F.lit(1.0).alias("v"),
    ).distinct()
    out = grid_nearest(
        pts, x0=float(gx0), y0=float(gy0), dx=1.0, dy=1.0, nx=nx, ny=ny,
        radius=float(maxdist),
    )
    return out.select(
        (F.lit(gx0) + F.col("ix")).alias("gx"),
        (F.lit(gy0) + F.col("iy")).alias("gy"),
        F.col("d2").cast("long").alias("d2"),
        F.sqrt("d2").alias("dist"),
    )
