"""The separable warp fast path must be BYTE-identical to the generic
meshgrid path — same doubles, just h+w transform evaluations instead of
h*w and outer-indexed gathers."""

import numpy as np
import pytest

from gdal_spark.kernels import warp as WK


@pytest.fixture()
def case():
    rng = np.random.default_rng(42)
    src = rng.uniform(0, 255, size=(300, 280)).astype(np.float64)
    size = 256
    gt_src = (-13100000.0, 60.0, 0.0, 4000000.0, 0.0, -60.0)
    lon0, lat0 = WK.transform_coords(gt_src[0], gt_src[3], "EPSG:3857", "EPSG:4326")
    lon1, lat1 = WK.transform_coords(
        gt_src[0] + 280 * 60.0, gt_src[3] - 300 * 60.0, "EPSG:3857", "EPSG:4326"
    )
    gt_dst = (lon0, (lon1 - lon0) / size, 0.0, lat0, 0.0, (lat1 - lat0) / size)
    return src, gt_src, gt_dst, size


@pytest.mark.parametrize("resampling", ["near", "bilinear", "cubic", "cubicspline", "lanczos"])
def test_separable_matches_generic(case, resampling, monkeypatch):
    src, gt_src, gt_dst, size = case
    fast = WK.warp_block(
        src, gt_src, "EPSG:3857", (size, size), gt_dst, "EPSG:4326",
        resampling, dst_nodata=0.0,
    )
    monkeypatch.setattr(WK, "_separable", lambda *a: False)
    slow = WK.warp_block(
        src, gt_src, "EPSG:3857", (size, size), gt_dst, "EPSG:4326",
        resampling, dst_nodata=0.0,
    )
    assert fast.tobytes() == slow.tobytes()


@pytest.mark.parametrize("resampling", ["near", "bilinear", "cubic", "cubicspline", "lanczos"])
def test_separable_matches_generic_offset_window(case, resampling, monkeypatch):
    """Partial-window form (src_x0/src_y0 offsets, edge out-of-bounds)."""
    src, gt_src, gt_dst, size = case
    win = src[40:, 32:]
    kw = dict(src_x0=32, src_y0=40, src_total_w=280, src_total_h=300)
    fast = WK.warp_block(
        win, gt_src, "EPSG:3857", (size, size), gt_dst, "EPSG:4326",
        resampling, 0.0, **kw,
    )
    monkeypatch.setattr(WK, "_separable", lambda *a: False)
    slow = WK.warp_block(
        win, gt_src, "EPSG:3857", (size, size), gt_dst, "EPSG:4326",
        resampling, 0.0, **kw,
    )
    assert fast.tobytes() == slow.tobytes()


@pytest.mark.parametrize("resampling", ["average", "rms", "sum"])
def test_box_separable_matches_loop(case, resampling, monkeypatch):
    """The matrix-product box resample (Wy @ src @ Wx^T) must match the
    per-pixel loop to ulp level (consumers round to >= 4 decimals; the
    only difference is summation order)."""
    src, gt_src, gt_dst, size = case
    fast = WK.warp_block(
        src, gt_src, "EPSG:3857", (size, size), gt_dst, "EPSG:4326",
        resampling, -1.0, src_total_w=280, src_total_h=300,
    )
    monkeypatch.setattr(WK, "_separable", lambda *a: False)
    slow = WK.warp_block(
        src, gt_src, "EPSG:3857", (size, size), gt_dst, "EPSG:4326",
        resampling, -1.0, src_total_w=280, src_total_h=300,
    )
    assert ((fast == -1.0) == (slow == -1.0)).all()
    ok = slow != -1.0
    assert np.allclose(fast[ok], slow[ok], rtol=1e-12, atol=1e-10)


@pytest.mark.parametrize("resampling", ["near", "bilinear", "average"])
def test_broadcast_gather_matches_shuffle(spark, resampling):
    """The broadcast small-raster gather and the grouped-shuffle gather
    must produce byte-identical dst blocks (same kernel, different data
    motion)."""
    from gdal_spark.operators import raster as R

    size = 300
    gt = (-13100000.0, 60.0, 0.0, 4000000.0, 0.0, -60.0)
    src = R.RasterMeta(size, size, gt, "EPSG:3857", block=128)
    lon0, lat0 = WK.transform_coords(gt[0], gt[3], "EPSG:3857", "EPSG:4326")
    lon1, lat1 = WK.transform_coords(
        gt[0] + size * 60.0, gt[3] - size * 60.0, "EPSG:3857", "EPSG:4326"
    )
    dst = R.RasterMeta(
        size, size,
        (lon0, (lon1 - lon0) / size, 0.0, lat0, 0.0, (lat1 - lat0) / size),
        "EPSG:4326", block=128,
    )
    blocks = R.synthetic_raster(spark, src, packed=True)

    def key(df):
        return {
            (r["bx"], r["by"]): (r["w"], r["h"], bytes(r["block"]))
            for r in df.collect()
        }

    got_b = key(R.warp(blocks, src, dst, resampling, gather="broadcast"))
    got_s = key(R.warp(blocks, src, dst, resampling, gather="shuffle"))
    assert got_b == got_s


def test_rotated_gt_rejects_separable():
    assert not WK._separable(
        (0, 1, 0.1, 0, 0, -1), (0, 1, 0, 0, 0, -1), "EPSG:3857", "EPSG:3857"
    )
    assert not WK._separable(
        (0, 1, 0, 0, 0, -1), (0, 1, 0, 0, 0, -1), "EPSG:3857", "EPSG:32633"
    )
