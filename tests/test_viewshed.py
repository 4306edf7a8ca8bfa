"""Viewshed vs the reference's C++ unit-test goldens
(autotest/cpp/test_viewshed.cpp) + the distributed cumulative operator."""

import numpy as np

from gdal_spark.kernels.viewshed import viewshed

SIMPLE_DEM = np.array(
    [
        [-1, 0, 1, 0, -1],
        [-1, 2, 0, 4, -1],
        [-1, 1, 0, -1, -1],
        [0, 3, 0, 2, 0],
        [-1, 0, 0, 3, -1],
    ],
    dtype=np.float64,
)
# test_viewshed.cpp TEST(Viewshed, simple_height) observable table
SIMPLE_OBSERVABLE = np.array(
    [
        [4, 2, 0, 4, 8],
        [3, 2, 0, 4, 3],
        [2, 1, 0, -1, -2],
        [4, 3, 0, 2, 1],
        [6, 3, 0, 2, 4],
    ],
    dtype=np.float64,
)


def test_simple_height_golden():
    vis, obs = viewshed(SIMPLE_DEM, 2, 2)
    assert np.array_equal(obs, SIMPLE_OBSERVABLE)
    assert np.array_equal(vis, SIMPLE_DEM >= SIMPLE_OBSERVABLE)


def test_all_visible_flat():
    # TEST(Viewshed, all_visible): flat raster => everything visible
    vis, _ = viewshed(np.zeros((7, 7)), 3, 3)
    assert vis.all()


def test_wall_shadow_row():
    """1-D sanity on the observer row: a wall hides exactly the cells
    whose slope to the observer is below the wall's."""
    dem = np.zeros((3, 12))
    dem[:, 4] = 10.0  # wall at distance 4 from observer at x=0
    vis, _ = viewshed(dem, 0, 1)
    row = vis[1]
    assert row[:5].all()  # up to and incl. the wall
    assert not row[5:].any()  # flat ground behind a 10-high wall at d=4


def test_cumulative_operator(spark):
    from gdal_spark.operators.viewshed_op import cumulative_viewshed

    obs = spark.createDataFrame([(2, 2), (0, 0)], "ox int, oy int")
    out = cumulative_viewshed(obs, SIMPLE_DEM).collect()
    counts = {(r["gx"], r["gy"]): r["n_visible"] for r in out}
    # observer cells see themselves
    assert counts[(2, 2)] >= 1 and counts[(0, 0)] >= 1
    # totals equal the sum of single-observer kernels
    v1, _ = viewshed(SIMPLE_DEM, 2, 2)
    v2, _ = viewshed(SIMPLE_DEM, 0, 0)
    assert sum(counts.values()) == int(v1.sum() + v2.sum())
    for (x, y), n in counts.items():
        assert n == int(v1[y, x]) + int(v2[y, x])
