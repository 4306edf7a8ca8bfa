"""WKB codec + ray-cast PIP vs a scalar transcription of
ogrlinearring.cpp:498-531 (isPointInRing) written independently here.
"""

import numpy as np
import pytest

from gdal_spark.kernels import pip, wkb


def ref_point_in_ring(test_x, test_y, ring):
    """Scalar literal transcription of the reference loop."""
    pts = ring
    n = len(pts)
    if n < 4:
        return False
    crossings = 0
    prev_dx = pts[0][0] - test_x
    prev_dy = pts[0][1] - test_y
    for i in range(1, n):
        x1 = pts[i][0] - test_x
        y1 = pts[i][1] - test_y
        x2 = prev_dx
        y2 = prev_dy
        if ((y1 > 0) and (y2 <= 0)) or ((y2 > 0) and (y1 <= 0)):
            intersection = (x1 * y2 - x2 * y1) / (y2 - y1)
            if 0.0 < intersection:
                crossings += 1
        prev_dx = x1
        prev_dy = y1
    return crossings % 2 == 1


SQUARE = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
TRIANGLE = [(0.0, 0.0), (4.0, 0.0), (2.0, 3.0), (0.0, 0.0)]
CONCAVE = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 1.0), (0.0, 4.0), (0.0, 0.0)]


@pytest.mark.parametrize("ring", [SQUARE, TRIANGLE, CONCAVE])
def test_ray_cast_matches_reference_incl_boundaries(ring):
    # grid including vertices, edge midpoints, inside, outside
    xs = np.linspace(-0.5, 4.5, 21)
    ys = np.linspace(-0.5, 4.5, 21)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    arr = np.array(ring)
    got = pip.points_in_ring(gx, gy, arr)
    want = np.array([ref_point_in_ring(x, y, ring) for x, y in zip(gx, gy)])
    np.testing.assert_array_equal(got, want)


def test_vertex_and_edge_points_exact_parity():
    arr = np.array(SQUARE)
    # exact boundary points — the reference rule gives specific (asymmetric)
    # answers; we must match them, whatever they are
    pts = [(0, 0), (1, 0), (1, 1), (0, 1), (0.5, 0), (1, 0.5), (0.5, 1), (0, 0.5)]
    for x, y in pts:
        got = bool(pip.points_in_ring(np.array([x]), np.array([y]), arr)[0])
        assert got == ref_point_in_ring(x, y, SQUARE), (x, y)


def test_polygon_with_hole():
    outer = np.array(SQUARE) * 4  # (0,0)..(4,4)
    hole = np.array([(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)])
    px = np.array([0.5, 2.0, 3.5])
    py = np.array([0.5, 2.0, 3.5])
    got = pip.points_in_polygon(px, py, [outer, hole])
    np.testing.assert_array_equal(got, [True, False, True])


def test_wkb_roundtrip_polygon_and_multipolygon():
    poly = wkb.polygon_wkb([SQUARE, [(0.25, 0.25), (0.75, 0.25), (0.5, 0.75)]])
    rings = wkb.decode_polygons(poly)[0]
    assert len(rings) == 2
    np.testing.assert_allclose(rings[0], np.array(SQUARE))
    # auto-closed hole
    assert rings[1][0].tolist() == rings[1][-1].tolist()

    mp = wkb.multipolygon_wkb([[SQUARE], [TRIANGLE]])
    polys = wkb.decode_polygons(mp)
    assert len(polys) == 2
    np.testing.assert_allclose(polys[1][0][:4], np.array(TRIANGLE))


def test_wkb_big_endian_import():
    import struct

    # hand-build XDR point
    buf = struct.pack(">BIdd", 0, 1, 3.0, 4.0)
    assert wkb.decode_point(buf) == (3.0, 4.0)
    # XDR polygon
    ring = SQUARE
    buf = struct.pack(">BII", 0, 3, 1) + struct.pack(">I", len(ring))
    for x, y in ring:
        buf += struct.pack(">dd", x, y)
    rings = wkb.decode_polygons(buf)[0]
    np.testing.assert_allclose(rings[0], np.array(SQUARE))


def test_envelope_and_area():
    poly = wkb.polygon_wkb([SQUARE])
    assert wkb.envelope(poly) == (0.0, 0.0, 1.0, 1.0)
    assert wkb.shoelace_area(poly) == pytest.approx(1.0)
    holed = wkb.polygon_wkb(
        [[(0, 0), (4, 0), (4, 4), (0, 4)], [(1, 1), (3, 1), (3, 3), (1, 3)]]
    )
    assert wkb.shoelace_area(holed) == pytest.approx(16.0 - 4.0)


def test_points_in_wkb_two_phase():
    poly = wkb.polygon_wkb([TRIANGLE])
    px = np.array([2.0, 2.0, -1.0, 5.0])
    py = np.array([1.0, 2.99, 0.5, 0.5])
    got = pip.points_in_wkb(px, py, poly)
    want = [ref_point_in_ring(x, y, TRIANGLE) for x, y in zip(px, py)]
    np.testing.assert_array_equal(got, want)


def test_wkt_output():
    assert wkb.wkt(wkb.point_wkb(1.5, -2.0)) == "POINT (1.5 -2)"
    assert wkb.wkt(wkb.polygon_wkb([SQUARE])).startswith("POLYGON ((0 0,1 0,")
