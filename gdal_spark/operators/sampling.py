"""Raster point sampling: InterpolateAtPoint as a DataFrame join.

Re-expresses GDALRasterBand::InterpolateAtPoint
(/root/reference/gcore/gdalrasterband.cpp:9956 ->
alg/gdal_interpolateatpoint.cpp:415): sample the raster at fractional
pixel positions derived from georeferenced point coordinates, with
nearest or bilinear interpolation (same index/weight rules as the warp
kernel, gdalwarpkernel.cpp:4934/2660).

Entirely JVM: the inverse geotransform is literal column math, the
point->block assignment is an equi-join key, and pixel reads are
element_at() on the block array — bilinear explodes each point into its
(up to 4) taps, joins each tap to its block, and re-aggregates the
weighted sum per point with renormalization by the in-raster weight
(points near the edge lose out-of-raster taps exactly like the kernel).
No Python anywhere, so sampling 10^12 points is a plain hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.geotransform import inv_geotransform
from .raster import RasterMeta


def _frac_pixels(points: DataFrame, meta: RasterMeta, x_col: str, y_col: str):
    inv = inv_geotransform(meta.gt)
    px = (
        F.lit(inv[0]) + F.col(x_col) * F.lit(inv[1]) + F.col(y_col) * F.lit(inv[2])
    )
    py = (
        F.lit(inv[3]) + F.col(x_col) * F.lit(inv[4]) + F.col(y_col) * F.lit(inv[5])
    )
    return points.withColumn("_px", px).withColumn("_py", py)


def sample_nearest(
    points: DataFrame, blocks: DataFrame, meta: RasterMeta,
    x_col: str = "x", y_col: str = "y",
) -> DataFrame:
    """Nearest-neighbour sample: input columns + (val). Points outside
    the raster (warp kernel's 1e-10-guarded reject rule) drop out."""
    bs = meta.block
    p = _frac_pixels(points, meta, x_col, y_col).filter(
        (F.col("_px") >= 0) & (F.col("_px") + 1e-10 <= meta.width)
        & (F.col("_py") >= 0) & (F.col("_py") + 1e-10 <= meta.height)
    )
    ix = F.least(
        (F.col("_px") + 1e-10).cast("long"), F.lit(meta.width - 1)
    )
    iy = F.least(
        (F.col("_py") + 1e-10).cast("long"), F.lit(meta.height - 1)
    )
    p = p.withColumn("_ix", ix).withColumn("_iy", iy).withColumn(
        "bx", (F.col("_ix") / bs).cast("int")
    ).withColumn("by", (F.col("_iy") / bs).cast("int"))
    j = p.join(blocks, ["bx", "by"])
    val = F.element_at(
        "block",
        (
            (F.col("_iy") - F.col("by") * bs) * F.col("w")
            + (F.col("_ix") - F.col("bx") * bs)
            + 1
        ).cast("int"),
    )
    return j.withColumn("val", val).drop(
        "_px", "_py", "_ix", "_iy", "bx", "by", "w", "h", "block"
    )


def sample_bilinear(
    points: DataFrame, blocks: DataFrame, meta: RasterMeta,
    x_col: str = "x", y_col: str = "y", id_cols: list[str] | None = None,
) -> DataFrame:
    """Bilinear sample (GWKBilinearResample4Sample weights incl. the
    ix==-1 edge snap): id_cols + (val)."""
    bs = meta.block
    id_cols = id_cols or ["point_id"]
    p = _frac_pixels(points, meta, x_col, y_col)
    ix0 = F.floor(F.col("_px") - 0.5).cast("long")
    iy0 = F.floor(F.col("_py") - 0.5).cast("long")
    ratx = 1.5 - (F.col("_px") - ix0)
    raty = 1.5 - (F.col("_py") - iy0)
    snap_x = ix0 == F.lit(-1)
    snap_y = iy0 == F.lit(-1)
    p = (
        p.withColumn("_ix0", F.when(snap_x, F.lit(0)).otherwise(ix0))
        .withColumn("_ratx", F.when(snap_x, F.lit(1.0)).otherwise(ratx))
        .withColumn("_iy0", F.when(snap_y, F.lit(0)).otherwise(iy0))
        .withColumn("_raty", F.when(snap_y, F.lit(1.0)).otherwise(raty))
    )
    taps = F.array(
        *[
            F.struct(
                (F.col("_ix0") + dx).alias("cx"),
                (F.col("_iy0") + dy).alias("cy"),
                (
                    (F.col("_ratx") if dx == 0 else 1.0 - F.col("_ratx"))
                    * (F.col("_raty") if dy == 0 else 1.0 - F.col("_raty"))
                ).alias("wgt"),
            )
            for dy in (0, 1)
            for dx in (0, 1)
        ]
    )
    t = p.select(*id_cols, F.explode(taps).alias("t")).select(
        *id_cols, "t.cx", "t.cy", "t.wgt"
    ).filter(
        (F.col("cx") >= 0) & (F.col("cx") < meta.width)
        & (F.col("cy") >= 0) & (F.col("cy") < meta.height)
    ).withColumn("bx", (F.col("cx") / bs).cast("int")).withColumn(
        "by", (F.col("cy") / bs).cast("int")
    )
    j = t.join(blocks, ["bx", "by"])
    val = F.element_at(
        "block",
        (
            (F.col("cy") - F.col("by") * bs) * F.col("w")
            + (F.col("cx") - F.col("bx") * bs)
            + 1
        ).cast("int"),
    )
    return (
        j.withColumn("_v", val)
        .groupBy(*id_cols)
        .agg((F.sum(F.col("_v") * F.col("wgt")) / F.sum("wgt")).alias("val"))
    )
