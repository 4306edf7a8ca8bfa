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


BOX_RESAMPLERS = (
    "average", "rms", "sum", "min", "max", "med", "q1", "q3", "mode"
)


def _separable(src_gt, dst_gt, src_crs: str, dst_crs: str) -> bool:
    """True when the dst-pixel -> src-pixel chain is axis-separable:
    rotation-free geotransforms on both sides and a CRS pair whose
    transform never mixes axes (identity, or 4326<->3857 — mercator x is
    a function of lon alone, y of lat alone). Then src x-coords depend
    only on the dst column and src y-coords only on the dst row, so the
    per-pixel transform math collapses from h*w to h+w evaluations and
    gathers become outer (np.ix_) indexing."""
    if not (dst_gt[2] == 0.0 and dst_gt[4] == 0.0
            and src_gt[2] == 0.0 and src_gt[4] == 0.0):
        return False
    return src_crs == dst_crs or {src_crs, dst_crs} == {
        "EPSG:4326", "EPSG:3857"
    }


def _sep_src_coords(w, h, dst_gt, dst_crs, src_gt, src_crs):
    """1-D fractional src pixel coords for dst pixel CENTERS: sx per dst
    column, sy per dst row.  Bit-identical to the meshgrid chain — the
    cross terms are exact zeros, and every remaining op is elementwise
    on the same doubles."""
    px = np.arange(w, dtype=np.float64) + 0.5
    py = np.arange(h, dtype=np.float64) + 0.5
    sx, _ = dst_pixel_to_src_pixel(
        px, np.full(w, 0.5), dst_gt, dst_crs, src_gt, src_crs
    )
    _, sy = dst_pixel_to_src_pixel(
        np.full(h, 0.5), py, dst_gt, dst_crs, src_gt, src_crs
    )
    return sx, sy


def _warp_block_separable(
    src, src_gt, src_crs, dst_shape, dst_gt, dst_crs, resampling,
    dst_nodata, src_x0, src_y0,
):
    """Fast path for near/bilinear/cubic on separable transforms; output
    bytes identical to the generic path (see tests/test_warp_separable)."""
    h, w = dst_shape
    sh, sw = src.shape
    sx, sy = _sep_src_coords(w, h, dst_gt, dst_crs, src_gt, src_crs)
    rx = sx - src_x0  # 1-D, length w
    ry = sy - src_y0  # 1-D, length h
    if resampling == "near":
        okx = (rx >= 0) & (rx + 1e-10 <= sw)
        oky = (ry >= 0) & (ry + 1e-10 <= sh)
        ix = np.minimum((rx + 1e-10).astype(np.int64), sw - 1)
        iy = np.minimum((ry + 1e-10).astype(np.int64), sh - 1)
        gathered = src[np.ix_(np.clip(iy, 0, sh - 1), np.clip(ix, 0, sw - 1))]
        ok = oky[:, None] & okx[None, :]
        return np.where(ok, gathered, float(dst_nodata))
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
            cy = iy + dy
            inby = (cy >= 0) & (cy < sh)
            cyc = np.clip(cy, 0, sh - 1)
            for dx, wx in ((0, ratx), (1, 1.0 - ratx)):
                cx = ix + dx
                inbx = (cx >= 0) & (cx < sw)
                cxc = np.clip(cx, 0, sw - 1)
                val = src[np.ix_(cyc, cxc)]
                wgt = wy[:, None] * wx[None, :]
                inb = inby[:, None] & inbx[None, :]
                acc += np.where(inb, val * wgt, 0.0)
                div += np.where(inb, wgt, 0.0)
        out = np.full(dst_shape, float(dst_nodata), dtype=np.float64)
        ok = div > 0
        out[ok] = acc[ok] / div[ok]
        return out
    if resampling in ("cubicspline", "lanczos"):
        ix = np.floor(rx - 0.5).astype(np.int64)
        iy = np.floor(ry - 0.5).astype(np.int64)
        dxf = rx - 0.5 - ix
        dyf = ry - 0.5 - iy
        if resampling == "cubicspline":
            def basis(x):
                xp2 = x + 2.0
                xp1 = x + 1.0
                xm1 = x - 1.0
                t1 = np.where(xm1 > 0.0, -4.0 * xm1 * xm1 * xm1, 0.0)
                t2 = np.where(x > 0.0, t1 + 6.0 * x * x * x, 0.0)
                t3 = np.where(xp1 > 0.0, t2 + -4.0 * xp1 * xp1 * xp1, 0.0)
                return np.where(xp2 > 0.0, t3 + xp2 * xp2 * xp2, 0.0)

            taps = range(-1, 3)
        else:
            def basis(t):
                pix = np.pi * t
                pix_over_r = pix / 3.0
                pix2_over_r = pix * pix_over_r
                s = np.sin(pix_over_r)
                s2 = s * s
                num = (3.0 - 4.0 * s2) * s2
                with np.errstate(invalid="ignore", divide="ignore"):
                    out_w = num / pix2_over_r
                return np.where(t == 0.0, 1.0, out_w)

            taps = range(-2, 4)
        acc = np.zeros(dst_shape, dtype=np.float64)
        wsum = np.zeros(dst_shape, dtype=np.float64)
        for r in taps:
            wy = basis(dyf - r)
            cy = iy + r
            inby = (cy >= 0) & (cy < sh)
            cyc = np.clip(cy, 0, sh - 1)
            for c in taps:
                wx = basis(dxf - c)
                cx = ix + c
                inbx = (cx >= 0) & (cx < sw)
                cxc = np.clip(cx, 0, sw - 1)
                wgt = wy[:, None] * wx[None, :]
                inb = inby[:, None] & inbx[None, :]
                val = src[np.ix_(cyc, cxc)]
                acc += np.where(inb, val * wgt, 0.0)
                wsum += np.where(inb, wgt, 0.0)
        out = np.full(dst_shape, float(dst_nodata), dtype=np.float64)
        ok = wsum > 1e-6
        out[ok] = acc[ok] / wsum[ok]
        return out
    if resampling == "cubic":
        bil = _warp_block_separable(
            src, src_gt, src_crs, dst_shape, dst_gt, dst_crs,
            "bilinear", dst_nodata, src_x0, src_y0,
        )
        ix = np.trunc(rx - 0.5).astype(np.int64)
        iy = np.trunc(ry - 0.5).astype(np.int64)
        dx = rx - 0.5 - ix
        dy = ry - 0.5 - iy
        intx = (ix - 1 >= 0) & (ix + 2 < sw)
        inty = (iy - 1 >= 0) & (iy + 2 < sh)
        interior = inty[:, None] & intx[None, :]

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
            cy = jj2 + (r - 1)
            for c, wxc in enumerate(wx):
                row += wxc[None, :] * src[np.ix_(cy, ii + (c - 1))]
            acc += wyr[:, None] * row
        return np.where(interior, acc, bil)
    raise ValueError(resampling)


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
    src_total_w: int | None = None,
    src_total_h: int | None = None,
) -> np.ndarray:
    """Warp one dst block from a (partial) src mosaic.

    src is the mosaic array whose [0,0] pixel is global src pixel
    (src_x0, src_y0) — callers gather only the needed window (the Spark
    operator's ComputeSourceWindow analogue).
    """
    if resampling in (
        "near", "bilinear", "cubic", "cubicspline", "lanczos"
    ) and _separable(src_gt, dst_gt, src_crs, dst_crs):
        return _warp_block_separable(
            src, src_gt, src_crs, dst_shape, dst_gt, dst_crs, resampling,
            dst_nodata, src_x0, src_y0,
        )
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
    if resampling == "cubicspline":
        # GWKBSpline (gdalwarpkernel.cpp): unnormalized cubic B-spline
        # basis over the 4x4 neighborhood, renormalized by the accumulated
        # weight (GWKResample); out-of-raster taps are skipped.
        ix = np.floor(rx - 0.5).astype(np.int64)
        iy = np.floor(ry - 0.5).astype(np.int64)
        dxf = rx - 0.5 - ix
        dyf = ry - 0.5 - iy

        def bspline(x):
            xp2 = x + 2.0
            xp1 = x + 1.0
            xm1 = x - 1.0
            t1 = np.where(xm1 > 0.0, -4.0 * xm1 * xm1 * xm1, 0.0)
            t2 = np.where(x > 0.0, t1 + 6.0 * x * x * x, 0.0)
            t3 = np.where(xp1 > 0.0, t2 + -4.0 * xp1 * xp1 * xp1, 0.0)
            return np.where(xp2 > 0.0, t3 + xp2 * xp2 * xp2, 0.0)

        acc = np.zeros(dst_shape, dtype=np.float64)
        wsum = np.zeros(dst_shape, dtype=np.float64)
        for r in range(-1, 3):
            wy = bspline(dyf - r)
            cy = iy + r
            for c in range(-1, 3):
                wx = bspline(dxf - c)
                cx = ix + c
                inb = (cx >= 0) & (cx < sw) & (cy >= 0) & (cy < sh)
                wgt = wx * wy
                val = np.zeros(dst_shape, dtype=np.float64)
                val[inb] = src[cy[inb], cx[inb]]
                acc += np.where(inb, val * wgt, 0.0)
                wsum += np.where(inb, wgt, 0.0)
        ok = wsum > 1e-6
        out[ok] = acc[ok] / wsum[ok]
        return out
    if resampling == "lanczos":
        # GWKLanczosSinc (gdalwarpkernel.cpp:3383): L(x) = sinc(x)sinc(x/3),
        # radius 3 (6x6 taps), computed with the reference's
        # sin(3x) = 3sin(x) - 4sin^3(x) identity; out-of-raster taps are
        # skipped and the accumulated weight renormalizes (GWKResample).
        ix = np.floor(rx - 0.5).astype(np.int64)
        iy = np.floor(ry - 0.5).astype(np.int64)
        dxf = rx - 0.5 - ix
        dyf = ry - 0.5 - iy

        def lanczos(t):
            pix = np.pi * t
            pix_over_r = pix / 3.0
            pix2_over_r = pix * pix_over_r
            s = np.sin(pix_over_r)
            s2 = s * s
            num = (3.0 - 4.0 * s2) * s2
            with np.errstate(invalid="ignore", divide="ignore"):
                out_w = num / pix2_over_r
            return np.where(t == 0.0, 1.0, out_w)

        acc = np.zeros(dst_shape, dtype=np.float64)
        wsum = np.zeros(dst_shape, dtype=np.float64)
        for r in range(-2, 4):
            wy = lanczos(dyf - r)
            cy = iy + r
            for c in range(-2, 4):
                wx = lanczos(dxf - c)
                cx = ix + c
                inb = (cx >= 0) & (cx < sw) & (cy >= 0) & (cy < sh)
                wgt = wx * wy
                val = np.zeros(dst_shape, dtype=np.float64)
                val[inb] = src[cy[inb], cx[inb]]
                acc += np.where(inb, val * wgt, 0.0)
                wsum += np.where(inb, wgt, 0.0)
        ok = wsum > 1e-6
        out[ok] = acc[ok] / wsum[ok]
        return out
    if resampling in BOX_RESAMPLERS:
        return _box_resample(
            src, src_gt, src_crs, dst_shape, dst_gt, dst_crs, resampling,
            dst_nodata, src_x0, src_y0,
            src_total_w if src_total_w is not None else src_x0 + sw,
            src_total_h if src_total_h is not None else src_y0 + sh,
        )
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


def _box_axis(lo, hi, total, eps=1e-10):
    """Per-axis box bounds + coverage weights (COMPUTE_WEIGHT rules) for
    the separable fast path.  Returns (valid, i0, i1, weight rows) with
    the same skip/clamp/widen rules as the per-pixel loop."""
    n = len(lo)
    valid = (hi > -eps) & (lo < total + eps)
    i0 = np.maximum(np.floor(lo + eps), 0.0).astype(np.int64)
    i1 = np.minimum(np.ceil(hi - eps), float(total)).astype(np.int64)
    widen = (i0 == i1) & (i1 < total)
    i1 = np.where(widen, i1 + 1, i1)
    valid &= i1 > i0
    return valid, i0, i1


def _box_resample_separable(
    src, dst_shape, resampling, dst_nodata,
    xmin, xmax, ymin, ymax, src_x0, src_y0, total_w, total_h,
) -> np.ndarray:
    """average/rms/sum on separable transforms as two matrix products:
    out = Wy @ src @ Wx^T with per-axis coverage-weight bands — the
    per-pixel python loop becomes O(h*w*band) BLAS work.  Summation
    order differs from the loop only at the 1e-16 ulp level (consumers
    round to >= 4 decimals)."""
    h, w = dst_shape
    sh, sw = src.shape
    vx, x0, x1 = _box_axis(xmin, xmax, total_w)
    vy, y0, y1 = _box_axis(ymin, ymax, total_h)
    Wx = np.zeros((w, sw), dtype=np.float64)
    for i in range(w):
        if not vx[i]:
            continue
        a, b = int(x0[i]), int(x1[i])
        ww_ = np.ones(b - a)
        if b - a > 1:
            ww_[0] = 1 - (xmin[i] - a)
            ww_[-1] = 1 - (b - xmax[i])
        Wx[i, a - src_x0 : b - src_x0] = ww_
    Wy = np.zeros((h, sh), dtype=np.float64)
    for j in range(h):
        if not vy[j]:
            continue
        a, b = int(y0[j]), int(y1[j])
        ww_ = np.ones(b - a)
        if b - a > 1:
            ww_[0] = 1 - (ymin[j] - a)
            ww_[-1] = 1 - (b - ymax[j])
        Wy[j, a - src_y0 : b - src_y0] = ww_
    num = Wy @ (src * src if resampling == "rms" else src) @ Wx.T
    out = np.full(dst_shape, float(dst_nodata), dtype=np.float64)
    ok = vy[:, None] & vx[None, :]
    if resampling == "sum":
        out[ok] = num[ok]
        return out
    denom = Wy.sum(axis=1)[:, None] * Wx.sum(axis=1)[None, :]
    if resampling == "average":
        out[ok] = num[ok] / denom[ok]
    else:  # rms
        out[ok] = np.sqrt(num[ok] / denom[ok])
    return out


def _box_resample(
    src, src_gt, src_crs, dst_shape, dst_gt, dst_crs, resampling,
    dst_nodata, src_x0, src_y0, total_w, total_h,
) -> np.ndarray:
    """Area resamplers GRA_Average/RMS/Sum/Min/Max/Med/Q1/Q3/Mode
    (/root/reference/alg/gdalwarpkernel.cpp:6502 GWKAverageOrModeThread):
    for each dst pixel, transform its two opposite CORNERS to source
    pixel space, take the source box [floor(min+eps), ceil(max-eps))
    (clamped to the raster; degenerate box widened by one), and reduce:

      * average/rms/sum — weighted by partial edge coverage
        (COMPUTE_WEIGHT / COMPUTE_WEIGHT_Y macros);
      * min/max — plain extrema over the box set;
      * med/q1/q3 — sort, index ceil(q*n - 1);
      * mode — the reference's running-argmax over coverage-weighted
        counts (ties keep the incumbent, so the winner is the last value
        to STRICTLY exceed the max — replicated exactly, scan order
        y-then-x).
    """
    h, w = dst_shape
    if resampling in ("average", "rms", "sum") and _separable(
        src_gt, dst_gt, src_crs, dst_crs
    ):
        px = np.arange(w + 1, dtype=np.float64)
        py = np.arange(h + 1, dtype=np.float64)
        sx1, _ = dst_pixel_to_src_pixel(
            px, np.full(w + 1, 0.0), dst_gt, dst_crs, src_gt, src_crs
        )
        _, sy1 = dst_pixel_to_src_pixel(
            np.full(h + 1, 0.0), py, dst_gt, dst_crs, src_gt, src_crs
        )
        return _box_resample_separable(
            src, dst_shape, resampling, dst_nodata,
            np.minimum(sx1[:-1], sx1[1:]), np.maximum(sx1[:-1], sx1[1:]),
            np.minimum(sy1[:-1], sy1[1:]), np.maximum(sy1[:-1], sy1[1:]),
            src_x0, src_y0, total_w, total_h,
        )
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ax, ay = dst_pixel_to_src_pixel(
        ii.astype(np.float64), jj.astype(np.float64), dst_gt, dst_crs, src_gt, src_crs
    )
    bx, by = dst_pixel_to_src_pixel(
        ii + 1.0, jj + 1.0, dst_gt, dst_crs, src_gt, src_crs
    )
    xmin, xmax = np.minimum(ax, bx), np.maximum(ax, bx)
    ymin, ymax = np.minimum(ay, by), np.maximum(ay, by)
    EPS = 1e-10
    out = np.full(dst_shape, float(dst_nodata), dtype=np.float64)
    q = {"med": 0.5, "q1": 0.25, "q3": 0.75}.get(resampling)
    for j in range(h):
        for i in range(w):
            dxm, dxM = xmin[j, i], xmax[j, i]
            dym, dyM = ymin[j, i], ymax[j, i]
            if not (dxM > -EPS and dxm < total_w + EPS):
                continue
            if not (dyM > -EPS and dym < total_h + EPS):
                continue
            x0 = int(max(np.floor(dxm + EPS), 0.0))
            x1 = int(min(np.ceil(dxM - EPS), total_w))
            if x0 == x1 and x1 < total_w:
                x1 += 1
            y0 = int(max(np.floor(dym + EPS), 0.0))
            y1 = int(min(np.ceil(dyM - EPS), total_h))
            if y0 == y1 and y1 < total_h:
                y1 += 1
            if x1 <= x0 or y1 <= y0:
                continue
            # window-relative slice (window always covers the box, by
            # construction of src_window_for_dst_block)
            vals = src[y0 - src_y0 : y1 - src_y0, x0 - src_x0 : x1 - src_x0]
            if vals.size == 0:
                continue
            if resampling in ("min", "max"):
                out[j, i] = vals.max() if resampling == "max" else vals.min()
                continue
            if q is not None:
                flat = np.sort(vals.ravel())
                out[j, i] = flat[int(np.ceil(q * flat.size - 1))]
                continue
            # coverage weights (COMPUTE_WEIGHT_Y / COMPUTE_WEIGHT)
            wy = np.ones(y1 - y0)
            if y1 - y0 > 1:
                wy[0] = 1 - (dym - y0)
                wy[-1] = 1 - (y1 - dyM)
            wx = np.ones(x1 - x0)
            if x1 - x0 > 1:
                wx[0] = 1 - (dxm - x0)
                wx[-1] = 1 - (x1 - dxM)
            wgt = wy[:, None] * wx[None, :]
            tw = wgt.sum()
            if resampling == "average":
                out[j, i] = (vals * wgt).sum() / tw
            elif resampling == "rms":
                out[j, i] = np.sqrt((vals * vals * wgt).sum() / tw)
            elif resampling == "sum":
                out[j, i] = (vals * wgt).sum()
            else:  # mode: running argmax, ties keep incumbent
                counts: dict = {}
                best_v, best_c = None, -1.0
                for vv, ww_ in zip(vals.ravel(), wgt.ravel()):
                    c = counts.get(vv, 0.0) + ww_
                    counts[vv] = c
                    if c > best_c:
                        best_v, best_c = vv, c
                out[j, i] = best_v
    return out


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
