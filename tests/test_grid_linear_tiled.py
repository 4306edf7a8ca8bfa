"""Distributed (tile-local) Delaunay grid_linear vs the driver path.

The tiled construction (operators/gridding.triangulate_tiled) must
produce EXACTLY the global triangulation the driver-side Bowyer-Watson
produces — same triangle set, same interpolated node values — for
points in general position, at any tile count (tiling invariance), and
on adversarial layouts (clusters with a large empty hole, where a
far-away triangle covers empty tiles and only the hull-coverage
escalation can find it).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import gridding as G


def _pts_df(spark, xs, ys, vs):
    from gdal_spark.session import local_df

    rows = [(float(x), float(y), float(v)) for x, y, v in zip(xs, ys, vs)]
    return local_df(spark, rows, "px double, py double, pv double")


def _tri_set(tdf):
    return {
        tuple(round(f, 9) for f in r)
        for r in tdf.select(
            "x1", "y1", "v1", "x2", "y2", "v2", "x3", "y3", "v3"
        ).collect()
    }


def _rand(n, seed, span=100.0):
    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, span, n)
    ys = rng.uniform(0, span * 0.6, n)
    vs = rng.uniform(-5, 5, n)
    return xs, ys, vs


def test_tiled_matches_driver_triangles(spark):
    xs, ys, vs = _rand(4000, 7)
    pts = _pts_df(spark, xs, ys, vs)
    driver = G._triangulate_driver(spark, pts.collect())
    tiled = G.triangulate_tiled(pts, target_per_tile=400)
    assert _tri_set(driver) == _tri_set(tiled)
    tiled.unpersist()


def test_tiling_invariance(spark):
    """The exact triangulation cannot depend on the tile grid."""
    xs, ys, vs = _rand(2500, 11)
    pts = _pts_df(spark, xs, ys, vs)
    a = G.triangulate_tiled(pts, target_per_tile=300)
    b = G.triangulate_tiled(pts, target_per_tile=1200)
    assert _tri_set(a) == _tri_set(b)
    a.unpersist()
    b.unpersist()


def test_clustered_hole_escalation(spark):
    """Two tight clusters far apart: the tiles between them are empty,
    and the triangles bridging the gap have circumdisks far larger than
    any first-pass halo — only the hull-coverage escalation finds them.
    The result must still equal the driver-path triangulation."""
    rng = np.random.default_rng(3)
    xs = np.concatenate([rng.uniform(0, 4, 400), rng.uniform(96, 100, 400)])
    ys = np.concatenate([rng.uniform(0, 4, 400), rng.uniform(0, 4, 400)])
    vs = rng.uniform(0, 1, 800)
    pts = _pts_df(spark, xs, ys, vs)
    driver = G._triangulate_driver(spark, pts.collect())
    tiled = G.triangulate_tiled(pts, target_per_tile=100)
    assert _tri_set(driver) == _tri_set(tiled)
    tiled.unpersist()


def test_grid_linear_auto_routes_and_matches(spark):
    """grid_linear above the driver threshold routes to the tiled path
    and interpolates the SAME node values (bit-identical: same triangle
    coordinates feed the same Spark expressions)."""
    xs, ys, vs = _rand(3000, 23)
    pts = _pts_df(spark, xs, ys, vs)

    def grid(threshold):
        out = G.grid_linear(
            pts, x0=5.0, y0=5.0, dx=3.0, dy=2.0, nx=30, ny=25,
            x_col="px", y_col="py", v_col="pv",
            driver_threshold=threshold, target_per_tile=500,
        )
        return {
            (r["ix"], r["iy"]): r["value"] for r in out.collect()
        }

    via_driver = grid(1_000_000)
    via_tiles = grid(100)  # forces the tiled path
    assert via_driver.keys() == via_tiles.keys()
    for k, v in via_driver.items():
        assert via_tiles[k] == pytest.approx(v, rel=1e-12, abs=1e-12)


def test_collinear_points_no_triangles(spark):
    xs = np.linspace(0, 10, 50)
    pts = _pts_df(spark, xs, xs * 2.0, np.ones(50))
    tiled = G.triangulate_tiled(pts, target_per_tile=10)
    assert tiled.count() == 0
    tiled.unpersist()


def test_duplicate_points_deduped(spark):
    """Coincident duplicates must not break Bowyer-Watson; min value
    wins deterministically in both paths."""
    xs, ys, vs = _rand(300, 5)
    xs2 = np.concatenate([xs, xs[:50]])
    ys2 = np.concatenate([ys, ys[:50]])
    vs2 = np.concatenate([vs, vs[:50] + 10.0])
    pts = _pts_df(spark, xs2, ys2, vs2)
    out = G.grid_linear(
        pts, x0=10.0, y0=10.0, dx=5.0, dy=4.0, nx=12, ny=10,
        x_col="px", y_col="py", v_col="pv",
    )
    base = G.grid_linear(
        _pts_df(spark, xs, ys, vs), x0=10.0, y0=10.0, dx=5.0, dy=4.0,
        nx=12, ny=10, x_col="px", y_col="py", v_col="pv",
    )
    got = {(r["ix"], r["iy"]): r["value"] for r in out.collect()}
    want = {(r["ix"], r["iy"]): r["value"] for r in base.collect()}
    assert got == want
