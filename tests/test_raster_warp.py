"""Raster model: warp (nearest/bilinear, 3857<->4326), stats, checksum.

Golden sources:
  * byte.tif fixture -> checksum 4672
    (/root/reference/autotest/gcore/tiff_read.py:45)
  * distributed warp == single-call reference-exact kernel (validates the
    block decomposition / window gather / mosaic path, FIXTURES.md F4)
"""

import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels import warp as WK
from gdal_spark.kernels.checksum import checksum
from gdal_spark.operators import raster as R

GT_UTM = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
BYTE_TIF = "/root/reference/autotest/gcore/data/byte.tif"


def ramp(w=100, h=100):
    return (
        np.arange(h, dtype=np.float64)[:, None] * 1000
        + np.arange(w, dtype=np.float64)[None, :]
    )


def merc_meta_pair():
    """A 3857 source grid near the UTM fixture location and a 4326 dst
    grid covering it (suggested-output style: roughly matching res)."""
    src = R.RasterMeta(100, 100, (-13100000.0, 60.0, 0.0, 4000000.0, 0.0, -60.0),
                       "EPSG:3857", block=32)
    # compute dst bounds from src corners
    lat0, lon0 = None, None
    lon_tl, lat_tl = WK.transform_coords(-13100000.0, 4000000.0, "EPSG:3857", "EPSG:4326")
    lon_br, lat_br = WK.transform_coords(
        -13100000.0 + 100 * 60.0, 4000000.0 - 100 * 60.0, "EPSG:3857", "EPSG:4326"
    )
    w = h = 100
    gt = (lon_tl, (lon_br - lon_tl) / w, 0.0, lat_tl, 0.0, (lat_br - lat_tl) / h)
    dst = R.RasterMeta(w, h, gt, "EPSG:4326", block=32)
    return src, dst


def test_cubic_reproduces_linear_ramp():
    """Catmull-Rom convolution is exact on linear functions — a warp of a
    linear ramp onto a shifted grid of the same CRS returns the ramp
    values at the dst pixel centers (interior)."""
    arr = ramp()
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    # dst grid shifted by a fractional pixel
    gt2 = (0.3, 1.0, 0.0, 0.7, 0.0, 1.0)
    out = WK.warp_block(arr, gt, "EPSG:3857", (100, 100), gt2, "EPSG:3857", "cubic")
    jj, ii = np.meshgrid(np.arange(100), np.arange(100), indexing="ij")
    expect = 1000.0 * (jj + 0.5 + 0.7 - 0.5) + (ii + 0.5 + 0.3 - 0.5)
    interior = np.zeros((100, 100), dtype=bool)
    interior[3:-3, 3:-3] = True
    assert np.allclose(out[interior], expect[interior], atol=1e-9)


@pytest.mark.parametrize("resampling", ["near", "bilinear", "cubic"])
def test_distributed_warp_matches_kernel(spark, resampling):
    arr = ramp()
    src, dst = merc_meta_pair()
    blocks, meta = R.raster_from_array(spark, arr, src.gt, src.crs, block=32)
    out_blocks = R.warp(blocks, src, dst, resampling)
    got = R.raster_to_array(out_blocks, dst)
    expected = WK.warp_block(arr, src.gt, src.crs, (dst.height, dst.width),
                             dst.gt, dst.crs, resampling, dst.nodata)
    if resampling == "near":
        assert np.array_equal(got, expected), (
            np.abs(got - expected).max(), (got != expected).sum()
        )
    else:
        # window-relative coords shift the float op order by an ulp; the
        # reference's own bilinear tolerance is maxdiff <= 1
        # (autotest/alg/warp.py:42-51) — we hold 1e-9
        assert np.abs(got - expected).max() < 1e-9
    assert (got != 0).sum() > 1000  # the warp actually covered the grid


def test_warp_roundtrip_nearest(spark):
    """3857 -> 4326 -> 3857 nearest round trip recovers interior values
    (maxdiff 0 on >90% of pixels; edges may differ by one src pixel)."""
    arr = ramp()
    src, dst = merc_meta_pair()
    b1, _ = R.raster_from_array(spark, arr, src.gt, src.crs, block=32)
    fwd = R.warp(b1, src, dst, "near")
    back = R.warp(fwd, dst, src, "near")
    got = R.raster_to_array(back, src)
    same = got == arr
    assert same.mean() > 0.9
    # differing pixels differ by at most one pixel step of the ramp
    d = np.abs(got - arr)[~same]
    assert d.size == 0 or d.max() <= 1001


def test_raster_stats(spark):
    arr = ramp()
    blocks, meta = R.raster_from_array(spark, arr, GT_UTM, "EPSG:3857", block=32)
    row = R.raster_stats(blocks).collect()[0]
    assert row["min"] == arr.min()
    assert row["max"] == arr.max()
    assert abs(row["mean"] - arr.mean()) < 1e-6
    assert abs(row["stddev"] - arr.std()) < 1e-4
    assert row["n_pixels"] == arr.size


@pytest.mark.skipif(not os.path.exists(BYTE_TIF), reason="reference not present")
def test_byte_tif_checksum_golden(spark):
    """The reference's canonical golden: GDALChecksumImage(byte.tif)==4672
    (autotest/gcore/tiff_read.py:45). byte.tif is a single uncompressed
    20x20 strip at offset 8."""
    buf = open(BYTE_TIF, "rb").read()
    pixels = np.frombuffer(buf[8:408], dtype=np.uint8).reshape(20, 20)
    assert checksum(pixels) == 4672
    blocks, meta = R.raster_from_array(
        spark, pixels.astype(np.float64), GT_UTM, "EPSG:32611", block=16
    )
    assert R.raster_checksum(blocks, meta) == 4672


def test_warp_mode_and_box_downsample(spark):
    """GRA_Mode majority + GRA_Average on an aligned 2x downsample
    (identity CRS): boxes are exact 2x2 blocks, so average = block mean
    and mode = majority value (ties impossible with 3+1 splits)."""
    import numpy as np

    from gdal_spark.operators import raster as R

    # 8x8: 2x2 blocks of a dominant value with one dissenting pixel
    src_arr = np.zeros((8, 8))
    for by in range(4):
        for bx in range(4):
            v = 10.0 * (by * 4 + bx)
            src_arr[2 * by : 2 * by + 2, 2 * bx : 2 * bx + 2] = v
            src_arr[2 * by, 2 * bx] = v + 4.0  # minority (1 of 4)... tie!
    # avoid 2-2 ties: make the dissent only in one corner of each block
    src_arr[::2, ::2] = src_arr[1::2, 1::2]  # revert: all 4 equal
    for by in range(4):
        for bx in range(4):
            src_arr[2 * by, 2 * bx] = 10.0 * (by * 4 + bx) + 4.0  # 1 vs 3
    gt_src = (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
    gt_dst = (0.0, 2.0, 0.0, 8.0, 0.0, -2.0)
    blocks, src = R.raster_from_array(spark, src_arr, gt_src, "EPSG:3857", block=4)
    dst = R.RasterMeta(4, 4, gt_dst, "EPSG:3857", block=4, nodata=-1.0)

    def vals(resampling):
        rows = R.warp(blocks, src, dst, resampling).collect()
        out = np.full((4, 4), np.nan)
        for r in rows:
            a = np.array(r["block"]).reshape(r["h"], r["w"])
            out[r["by"] * 4 : r["by"] * 4 + r["h"],
                r["bx"] * 4 : r["bx"] * 4 + r["w"]] = a
        return out

    mode = vals("mode")
    avg = vals("average")
    mn, mx = vals("min"), vals("max")
    for by in range(4):
        for bx in range(4):
            v = 10.0 * (by * 4 + bx)
            assert mode[by, bx] == v  # majority 3-of-4
            assert abs(avg[by, bx] - (v + 1.0)) < 1e-9  # (3v + v+4)/4
            assert mn[by, bx] == v
            assert mx[by, bx] == v + 4.0


def test_packed_byte_transport(spark):
    """u1-packed blocks (GDT_Byte transport, 8x fewer bytes) warp to the
    same values as f8: near is byte-exact; interpolating resamplers
    round with GDALCopyWords' floor(v + 0.5) clamp into the byte
    transport."""
    import numpy as np

    from gdal_spark.operators import raster as R
    from gdal_spark.kernels.warp import transform_coords as tc

    s = 512
    gt = (-13100000.0, 60.0, 0.0, 4000000.0, 0.0, -60.0)
    src = R.RasterMeta(s, s, gt, "EPSG:3857", block=128)
    a0 = tc(gt[0], gt[3], "EPSG:3857", "EPSG:4326")
    a1 = tc(gt[0] + s * 60.0, gt[3] - s * 60.0, "EPSG:3857", "EPSG:4326")
    dst = R.RasterMeta(
        s, s,
        (a0[0], (a1[0] - a0[0]) / s, 0.0, a0[1], 0.0, (a1[1] - a0[1]) / s),
        "EPSG:4326", block=128,
    )
    b8 = R.synthetic_raster(spark, src, packed=True)
    b1 = R.synthetic_raster(spark, src, packed=True, dtype="u1")
    w8 = R.raster_to_array(R.warp(b8, src, dst, "near"), dst)
    w1 = R.raster_to_array(R.warp(b1, src, dst, "near"), dst)
    assert np.array_equal(w8, w1)
    wb8 = R.raster_to_array(R.warp(b8, src, dst, "bilinear"), dst)
    wb1 = R.raster_to_array(R.warp(b1, src, dst, "bilinear"), dst)
    assert np.array_equal(wb1, np.clip(np.floor(wb8 + 0.5), 0, 255))


def test_group_factor_invariance(spark):
    """2x2 gather grouping is a pure transport optimization: dst arrays
    are byte-identical across group factors (and to the ungrouped g=1
    plan) for every resampler family member we spot-check."""
    import numpy as np

    from gdal_spark.operators import raster as R
    from gdal_spark.kernels.warp import transform_coords as tc

    s = 512
    gt = (-13100000.0, 60.0, 0.0, 4000000.0, 0.0, -60.0)
    src = R.RasterMeta(s, s, gt, "EPSG:3857", block=128)
    a0 = tc(gt[0], gt[3], "EPSG:3857", "EPSG:4326")
    a1 = tc(gt[0] + s * 60.0, gt[3] - s * 60.0, "EPSG:3857", "EPSG:4326")
    dst = R.RasterMeta(
        s, s,
        (a0[0], (a1[0] - a0[0]) / s, 0.0, a0[1], 0.0, (a1[1] - a0[1]) / s),
        "EPSG:4326", block=128,
    )
    blocks = R.synthetic_raster(spark, src, packed=True)
    for resampling in ("near", "bilinear", "average"):
        outs = [
            R.raster_to_array(
                R.warp(blocks, src, dst, resampling, group_factor=g), dst
            )
            for g in (1, 2, 4)
        ]
        assert np.array_equal(outs[0], outs[1]), resampling
        assert np.array_equal(outs[0], outs[2]), resampling
