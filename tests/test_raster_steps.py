"""Raster pipeline steps: the paths the driver oracles don't reach —
signed set-type rounding, fill-nodata smoothing iterations, resize with
non-nearest resamplers, pansharpen zero-division."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators import raster as R
from gdal_spark.operators.fillnodata import fill_nodata
from gdal_spark.operators.rastermath import (
    pansharpen_blocks,
    set_type_blocks,
    stack_blocks,
)


def _tiny(spark, arr, nodata=0.0, block=8):
    return R.raster_from_array(
        spark, np.asarray(arr, dtype=np.float64),
        (0.0, 1.0, 0.0, 0.0, 0.0, -1.0), "EPSG:3857",
        block=block, nodata=nodata,
    )


def test_set_type_signed_rounding(spark):
    """GDALCopyWord signed rule: round half AWAY from zero, clamp,
    truncate (gdal_priv_templates.hpp:660-695)."""
    vals = [[-2.5, -2.4, 2.5, 2.4], [-40000.0, 40000.0, -0.4, 0.6]]
    blocks, meta = _tiny(spark, vals)
    out = R.raster_to_array(set_type_blocks(blocks, "Int16"), meta)
    assert out.tolist() == [[-3.0, -2.0, 3.0, 2.0], [-32768.0, 32767.0, 0.0, 1.0]]
    outb = R.raster_to_array(set_type_blocks(blocks, "Byte"), meta)
    assert outb.tolist() == [[0.0, 0.0, 3.0, 2.0], [0.0, 255.0, 0.0, 1.0]]
    outf = R.raster_to_array(set_type_blocks(blocks, "Float32"), meta)
    assert outf[0][0] == np.float64(np.float32(-2.5))


def test_fill_nodata_idw_and_smoothing(spark):
    """Single hole surrounded by knowns: IDW fill = weighted mean of the
    in-radius valid ring; one smoothing pass then averages the 3x3."""
    a = np.arange(25, dtype=np.float64).reshape(5, 5) + 1.0
    a[2, 2] = -1.0  # hole
    blocks, meta = _tiny(spark, a, nodata=-1.0)
    out = R.raster_to_array(fill_nodata(blocks, meta, 1), meta)
    # radius 1: only the 4 orthogonal neighbors (d=1), mean = (8+12+14+18)/4
    assert abs(out[2, 2] - 13.0) < 1e-12
    assert np.array_equal(np.delete(out.ravel(), 12), np.delete(a.ravel(), 12))
    sm = R.raster_to_array(fill_nodata(blocks, meta, 1, smoothing_iterations=1), meta)
    # smoothing averages the filled pixel's full (all-valid) 3x3 window
    win = np.array([[7, 8, 9], [12, 13, 14], [17, 18, 19]], dtype=np.float64)
    assert abs(sm[2, 2] - win.mean()) < 1e-12
    # non-hole pixels untouched by smoothing
    assert np.array_equal(np.delete(sm.ravel(), 12), np.delete(a.ravel(), 12))


def test_resize_average_downscale(spark):
    """Integer 2x downscale with 'average' = exact 2x2 box means."""
    a = np.arange(64, dtype=np.float64).reshape(8, 8)
    blocks, meta = _tiny(spark, a)
    out_blocks, out_meta = R.resize(blocks, meta, 4, 4, "average")
    out = R.raster_to_array(out_blocks, out_meta)
    expect = a.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    assert np.allclose(out, expect, atol=1e-12)


def test_pansharpen_zero_pseudo(spark):
    """pseudo_pan == 0 -> factor 0 (ComputeFactor, gdalpansharpen.cpp:576)."""
    pan, meta = _tiny(spark, [[10.0, 20.0], [30.0, 40.0]])
    s1, _ = _tiny(spark, [[0.0, 2.0], [4.0, 0.0]])
    s2, _ = _tiny(spark, [[0.0, 6.0], [4.0, 8.0]])
    out = pansharpen_blocks(pan, [s1, s2], [0.5, 0.5])
    rows = {(r["bx"], r["by"]): r for r in out.collect()}
    b1 = np.asarray(rows[(0, 0)]["block_1"]).reshape(2, 2)
    assert b1[0, 0] == 0.0  # both spectral zero -> factor 0
    ps = 0.5 * 2.0 + 0.5 * 6.0
    assert abs(b1[0, 1] - 2.0 * (20.0 / ps)) < 1e-12


def test_stack_keys_and_payloads(spark):
    a, meta = _tiny(spark, np.ones((4, 4)))
    b, _ = _tiny(spark, np.full((4, 4), 2.0))
    st = stack_blocks([a, b]).collect()
    assert len(st) == 1
    assert np.asarray(st[0]["block_1"]).sum() == 16.0
    assert np.asarray(st[0]["block_2"]).sum() == 32.0


def test_pack_unpack_roundtrip_dtypes(spark):
    """pack_blocks at every transport dtype -> unpack_blocks returns the
    original float64 values (u1/i2 inputs are integral by construction)."""
    import numpy as np

    from gdal_spark.operators import raster as R

    arr = (np.arange(48.0 * 32.0).reshape(48, 32) % 200.0)
    blocks, meta = R.raster_from_array(spark, arr, (0, 1, 0, 0, 0, 1), "x", block=16)
    for dtype in ("<f8", "<f4", "<i2", "u1"):
        packed = R.pack_blocks(blocks, dtype=dtype)
        back = R.raster_to_array(R.unpack_blocks(packed), meta)
        assert np.array_equal(back, arr), dtype
