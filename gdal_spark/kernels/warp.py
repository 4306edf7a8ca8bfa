"""Raster warp kernel: inverse-mapping resample, reference-exact.

Reproduces the gdalwarp dst-driven inverse mapping
(/root/reference/alg/gdalwarpkernel.cpp GWKNearestThread:6206 and
GWKBilinearResample4Sample:2660, offsets GWKCheckAndComputeSrcOffsets:4934):

  * for every dst pixel CENTER (iDst + 0.5), chain dst-gt -> dst SRS ->
    src SRS -> inverse src-gt to source pixel coords
    (GDALGenImgProjTransform, alg/gdaltransformer.cpp:3044);
  * nearest: reject when srcX < 0 or srcX + 1e-10 > nSrcXSize (same for
    Y), take iSrc = int(src + 1e-10), clamp == size to size-1;
  * bilinear: iSrc = floor(src - 0.5), ratio = 1.5 - (src - iSrc), the
    iSrc == -1 edge snap, weights {r, 1-r} x {r, 1-r} over the 2x2
    neighborhood, normalized by the sum of in-bounds weights.

CRS support: EPSG:4326 and EPSG:3857 via the closed-form spherical
mercator (kernels/mercator.py, gdal2tiles.py:422-442) — no PROJ.
All vectorized numpy over whole blocks (the pandas_udf inner kernel).
"""

from __future__ import annotations

import numpy as np

from .geotransform import apply_geotransform, inv_geotransform
from .mercator import latlon_to_meters, meters_to_latlon

_NODATA_FAIL = np.nan


def transform_coords(x, y, src_crs: str, dst_crs: str):
    """Georeferenced coords src_crs -> dst_crs (4326 uses x=lon, y=lat)."""
    if src_crs == dst_crs:
        return x, y
    if src_crs == "EPSG:4326" and dst_crs == "EPSG:3857":
        mx, my = latlon_to_meters(y, x)
        return mx, my
    if src_crs == "EPSG:3857" and dst_crs == "EPSG:4326":
        lat, lon = meters_to_latlon(x, y)
        return lon, lat
    raise ValueError(f"unsupported CRS pair {src_crs} -> {dst_crs}")


def dst_pixel_to_src_pixel(px, py, dst_gt, dst_crs, src_gt, src_crs):
    """Fractional dst pixel coords -> fractional src pixel coords."""
    gx, gy = apply_geotransform(dst_gt, px, py)
    sx, sy = transform_coords(gx, gy, dst_crs, src_crs)
    inv = inv_geotransform(src_gt)
    return apply_geotransform(inv, sx, sy)


def warp_block(
    src: np.ndarray,
    src_gt,
    src_crs: str,
    dst_shape,
    dst_gt,
    dst_crs: str,
    resampling: str = "near",
    dst_nodata: float = 0.0,
    src_x0: int = 0,
    src_y0: int = 0,
) -> np.ndarray:
    """Warp one dst block from a (partial) src mosaic.

    src is the mosaic array whose [0,0] pixel is global src pixel
    (src_x0, src_y0) — callers gather only the needed window (the Spark
    operator's ComputeSourceWindow analogue).
    """
    h, w = dst_shape
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sx, sy = dst_pixel_to_src_pixel(
        ii + 0.5, jj + 0.5, dst_gt, dst_crs, src_gt, src_crs
    )
    out = np.full(dst_shape, float(dst_nodata), dtype=np.float64)
    sh, sw = src.shape
    # window-relative source pixel coords
    rx = sx - src_x0
    ry = sy - src_y0
    if resampling == "near":
        ok = (rx >= 0) & (rx + 1e-10 <= sw) & (ry >= 0) & (ry + 1e-10 <= sh)
        ix = (rx + 1e-10).astype(np.int64)
        iy = (ry + 1e-10).astype(np.int64)
        ix = np.minimum(ix, sw - 1)
        iy = np.minimum(iy, sh - 1)
        out[ok] = src[iy[ok], ix[ok]]
        return out
    if resampling == "bilinear":
        ix = np.floor(rx - 0.5).astype(np.int64)
        iy = np.floor(ry - 0.5).astype(np.int64)
        ratx = 1.5 - (rx - ix)
        raty = 1.5 - (ry - iy)
        snap_x = ix == -1
        ix = np.where(snap_x, 0, ix)
        ratx = np.where(snap_x, 1.0, ratx)
        snap_y = iy == -1
        iy = np.where(snap_y, 0, iy)
        raty = np.where(snap_y, 1.0, raty)
        acc = np.zeros(dst_shape, dtype=np.float64)
        div = np.zeros(dst_shape, dtype=np.float64)
        for dy, wy in ((0, raty), (1, 1.0 - raty)):
            for dx, wx in ((0, ratx), (1, 1.0 - ratx)):
                cx = ix + dx
                cy = iy + dy
                inb = (cx >= 0) & (cx < sw) & (cy >= 0) & (cy < sh)
                wgt = wx * wy
                val = np.zeros(dst_shape, dtype=np.float64)
                val[inb] = src[cy[inb], cx[inb]]
                acc += np.where(inb, val * wgt, 0.0)
                div += np.where(inb, wgt, 0.0)
        ok = div > 0
        out[ok] = acc[ok] / div[ok]
        return out
    if resampling == "cubic":
        # GWKCubicResample4Sample (gdalwarpkernel.cpp:2820): Catmull-Rom
        # separable convolution over the 4x4 neighborhood; pixels whose
        # 4x4 support leaves the raster fall back to the bilinear sample.
        bil = warp_block(
            src, src_gt, src_crs, dst_shape, dst_gt, dst_crs,
            "bilinear", dst_nodata, src_x0, src_y0,
        )
        ix = np.trunc(rx - 0.5).astype(np.int64)  # C cast truncation
        iy = np.trunc(ry - 0.5).astype(np.int64)
        dx = rx - 0.5 - ix
        dy = ry - 0.5 - iy
        interior = (ix - 1 >= 0) & (ix + 2 < sw) & (iy - 1 >= 0) & (iy + 2 < sh)

        def weights(t):
            half = 0.5 * t
            three = 3.0 * t
            half2 = half * t
            return (
                half * (-1 + t * (2 - t)),
                1 + half2 * (-5 + three),
                half * (1 + t * (4 - three)),
                half2 * (-1 + t),
            )

        wx = weights(dx)
        wy = weights(dy)
        ii = np.clip(ix, 1, max(sw - 3, 1))
        jj2 = np.clip(iy, 1, max(sh - 3, 1))
        acc = np.zeros(dst_shape, dtype=np.float64)
        for r, wyr in enumerate(wy):
            row = np.zeros(dst_shape, dtype=np.float64)
            for c, wxc in enumerate(wx):
                row += wxc * src[jj2 + (r - 1), ii + (c - 1)]
            acc += wyr * row
        out = np.where(interior, acc, bil)
        return out
    raise ValueError(f"unsupported resampling {resampling}")


def src_window_for_dst_block(
    dst_x0, dst_y0, dst_w, dst_h, dst_gt, dst_crs, src_gt, src_crs, margin=2
):
    """Bounding src pixel window needed to warp the given dst block.

    4326<->3857 is separable and monotone per axis, so transforming the
    block's edge pixel centers bounds the window (the reference walks a
    21x21 grid for arbitrary PROJ pipelines, alg/gdaltransformer.cpp:342;
    monotonicity makes edges sufficient here).
    """
    xs = np.concatenate([
        np.linspace(dst_x0, dst_x0 + dst_w, 22),
        np.full(22, dst_x0),
        np.full(22, dst_x0 + dst_w),
        np.linspace(dst_x0, dst_x0 + dst_w, 22),
    ])
    ys = np.concatenate([
        np.full(22, dst_y0),
        np.linspace(dst_y0, dst_y0 + dst_h, 22),
        np.linspace(dst_y0, dst_y0 + dst_h, 22),
        np.full(22, dst_y0 + dst_h),
    ])
    sx, sy = dst_pixel_to_src_pixel(xs, ys, dst_gt, dst_crs, src_gt, src_crs)
    good = np.isfinite(sx) & np.isfinite(sy)
    if not good.any():
        return 0, 0, 0, 0
    x0 = int(np.floor(sx[good].min())) - margin
    y0 = int(np.floor(sy[good].min())) - margin
    x1 = int(np.ceil(sx[good].max())) + margin
    y1 = int(np.ceil(sy[good].max())) + margin
    return x0, y0, x1 - x0, y1 - y0
