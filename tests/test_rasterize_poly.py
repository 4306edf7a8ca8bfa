"""Polygon rasterization: scanline fill semantics over zone polygons."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels import wkb as W
from gdal_spark.kernels.pip import points_in_polygon
from gdal_spark.kernels.rasterize import fill_rings_px
from gdal_spark.operators.rasterize_poly import _rings_to_global_px, rasterize_zones
from gdal_spark.operators.zones import zones_df


def test_scanline_matches_pixel_center_pip():
    """Scanline fill == ray-cast of pixel centers (generic positions):
    the two reference rules (llrasterize.cpp:41 rule vs
    ogrlinearring.cpp:498 crossing parity) agree away from edges."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        pts = rng.uniform(2, 60, size=(5, 2))
        ring = np.vstack([pts, pts[:1]])
        mask = fill_rings_px([ring], 64, 64)
        jj, ii = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        pip = points_in_polygon(ii.ravel() + 0.5, jj.ravel() + 0.5, [ring]).reshape(
            64, 64
        )
        diff = (mask != pip).sum()
        assert diff <= 3, diff  # ulp-band boundary pixels only


def test_rasterize_zones_triangle_tolerance(spark):
    """Triangle zone: distributed output matches driver-side kernel run
    exactly; vs the analytic predicate only ulp-band pixels may differ."""
    z = zones_df(spark).filter(F.col("zone_id") == 103)
    out = rasterize_zones(z, 10).collect()
    got = {(r["tx"], r["ty"], r["px"], r["py"]) for r in out}
    # driver-side same kernel
    rows = set()
    spec = [r for r in zones_df(spark).collect() if r["zone_id"] == 103][0]
    for rings in W.decode_polygons(bytes(spec["geometry"])):
        gp = _rings_to_global_px(rings, 10)
        allpts = np.vstack(gp)
        tx0, tx1 = int(allpts[:, 0].min()) // 256, int(allpts[:, 0].max()) // 256
        ty0, ty1 = int(allpts[:, 1].min()) // 256, int(allpts[:, 1].max()) // 256
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                local = [r - np.array([tx * 256, ty * 256]) for r in gp]
                mask = fill_rings_px(local, 256, 256)
                yy, xx = np.nonzero(mask)
                rows.update((tx, ty, int(x), int(y)) for x, y in zip(xx, yy))
    assert got == rows
    assert len(got) > 1000


def test_rasterize_merge_modes(spark):
    z = zones_df(spark).filter(F.col("zone_id").isin([101, 107]))  # 107 inside 101
    per = rasterize_zones(z, 10)
    add = rasterize_zones(z, 10, merge="add")
    overlap = add.filter(F.col("burn") == 2).count()
    assert overlap > 0  # the sliver overlaps nyc_core
    repl = rasterize_zones(z, 10, merge="replace")
    assert repl.filter(F.col("burn") == 107).count() == overlap
    assert per.count() == add.selectExpr("sum(burn)").collect()[0][0]
