"""Marching-squares contour: analytic goldens + distributed parity."""

import numpy as np

from gdal_spark.kernels.contour import contour_segments
from gdal_spark.operators import raster as R
from gdal_spark.operators.contour_op import contour

GT = (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)


def bump(n=96):
    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return 100.0 - np.hypot(ii - n / 2, jj - n / 2)


def test_ramp_contour_is_vertical_line():
    arr = np.tile(np.arange(12, dtype=float), (12, 1))
    segs = contour_segments(arr, 4.25)
    assert len(segs) == 11
    assert np.allclose(segs[:, [0, 2]], 4.75)


def test_circle_contour_closed_and_right_length():
    z = bump(40)
    segs = contour_segments(z, 89.9)  # off-node level (no degeneracies)
    length = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1]).sum()
    r = 100 - 89.9
    assert abs(length - 2 * np.pi * r) < 0.5
    from collections import Counter

    cnt = Counter()
    for s in segs:
        cnt[(round(s[0], 9), round(s[1], 9))] += 1
        cnt[(round(s[2], 9), round(s[3], 9))] += 1
    assert all(v == 2 for v in cnt.values())  # closed curve


def test_distributed_contour_matches_kernel(spark):
    arr = bump(96)
    blocks, meta = R.raster_from_array(spark, arr, GT, "EPSG:3857", block=32)
    levels = [60.0, 80.5, 95.2]
    got = contour(blocks, meta, levels).collect()
    # whole-array reference: same kernel + georeference
    from gdal_spark.kernels.geotransform import apply_geotransform

    expect = set()
    for lv in levels:
        segs = contour_segments(arr, lv)
        for s in segs:
            x1, y1 = apply_geotransform(GT, s[0], s[1])
            x2, y2 = apply_geotransform(GT, s[2], s[3])
            expect.add((lv, round(float(x1), 9), round(float(y1), 9),
                        round(float(x2), 9), round(float(y2), 9)))
    got_set = {
        (r["level"], round(r["x1"], 9), round(r["y1"], 9),
         round(r["x2"], 9), round(r["y2"], 9))
        for r in got
    }
    assert got_set == expect
    assert len(got_set) > 100
