"""DEM focal ops: analytic goldens + distributed halo-exchange parity."""

import numpy as np
import pytest

from gdal_spark.kernels import dem as DEM
from gdal_spark.operators import raster as R
from gdal_spark.operators.focal import focal

GT = (0.0, 10.0, 0.0, 1000.0, 0.0, -10.0)  # 10m pixels, north-up


def plane(w=96, h=96, sx=2.0, sy=-3.0):
    """z = sx*x + sy*y (in pixel units)."""
    return (
        sx * np.arange(w, dtype=np.float64)[None, :]
        + sy * np.arange(h, dtype=np.float64)[:, None]
    )


def test_slope_of_plane_analytic():
    """Horn slope of a plane == atan(|grad|) exactly (interior pixels).

    dz/dx = sx / ewres, dz/dy = sy / (-nsres) in map units."""
    arr = plane()
    pad = np.pad(arr, 1, mode="edge")  # edge padding only affects border
    s = DEM.slope(pad, GT[1], GT[5])
    expect = np.degrees(np.arctan(np.hypot(2.0 / 10.0, -(-3.0) / -10.0)))
    interior = s[2:-2, 2:-2]
    assert np.allclose(interior, expect, atol=1e-9)


def test_hillshade_range_and_flat():
    flat = np.zeros((20, 20))
    hs = DEM.hillshade(np.pad(flat, 1, mode="edge"), GT[1], GT[5])
    # flat terrain: cang = 254*sin(45deg), out = 1 + cang
    assert np.allclose(hs, 1.0 + 254.0 * np.sin(np.deg2rad(45.0)))
    arr = plane()
    hs2 = DEM.hillshade(np.pad(arr, 1, mode="edge"), GT[1], GT[5])
    assert hs2.min() >= 1.0 and hs2.max() <= 255.0


def test_focal_distributed_matches_kernel(spark):
    """Distributed halo exchange == driver-side whole-array kernel for
    every op (interior; boundary pixels are nodata by reference default)."""
    rng = np.random.default_rng(3)
    arr = rng.uniform(0, 500, size=(96, 96))
    blocks, meta = R.raster_from_array(spark, arr, GT, "EPSG:3857", block=32)
    pad = np.pad(arr, 1, mode="constant", constant_values=meta.nodata)
    for op, kernel in [
        ("hillshade", lambda p: DEM.hillshade(p, GT[1], GT[5])),
        ("slope", lambda p: DEM.slope(p, GT[1], GT[5])),
        ("aspect", lambda p: DEM.aspect(p)),
        ("tri", DEM.tri),
        ("tpi", DEM.tpi),
        ("roughness", DEM.roughness),
    ]:
        out = R.raster_to_array(focal(blocks, meta, op), meta)
        expect = kernel(pad)
        expect[0, :] = expect[-1, :] = meta.nodata
        expect[:, 0] = expect[:, -1] = meta.nodata
        assert np.allclose(out, expect, atol=1e-12), op
