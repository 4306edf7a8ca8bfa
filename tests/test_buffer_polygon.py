"""Polygon buffer: Minkowski dilation by a discretized disk via the
make-valid arrangement (kernels/geomops.buffer_polygon).

Axis-aligned fixtures give exact closed forms for the K=32 disk:
  area = A + P*r + (fan turns)*(K/2)*r^2*sin(2pi/K)
with a quarter fan per convex right angle, an r x r strip overlap
subtracted per right-angle reflex corner, and square holes shrinking to
side (h - 2r) with sharp corners."""

import math

from gdal_spark.kernels.geomops import buffer_polygon

R = 0.5
K = 32
FULL_FAN = (K / 2.0) * R * R * math.sin(2.0 * math.pi / K)
QUARTER_FAN = FULL_FAN / 4.0


def _ring(*pts):
    return list(pts) + [pts[0]]


def _area(polys):
    tot = 0.0
    for rings in polys:
        for r in rings:
            a = 0.0
            for (x1, y1), (x2, y2) in zip(r, r[1:]):
                a += x1 * y2 - x2 * y1
            tot += a / 2.0  # holes trace CW -> negative
    return tot


def test_rect_closed_form():
    out = buffer_polygon([[_ring((0, 0), (8, 0), (8, 6), (0, 6))]], R)
    assert len(out) == 1 and len(out[0]) == 1
    assert abs(_area(out) - (48 + 28 * R + FULL_FAN)) < 1e-9


def test_l_shape_reflex_corner():
    out = buffer_polygon(
        [[_ring((0, 0), (6, 0), (6, 3), (3, 3), (3, 6), (0, 6))]], R
    )
    assert len(out) == 1 and len(out[0]) == 1
    expected = 27 + 24 * R + 5 * QUARTER_FAN - R * R
    assert abs(_area(out) - expected) < 1e-9


def test_hole_shrinks_sharp():
    out = buffer_polygon(
        [[
            _ring((0, 0), (10, 0), (10, 10), (0, 10)),
            _ring((3, 3), (3, 7), (7, 7), (7, 3)),
        ]],
        R,
    )
    assert len(out) == 1 and len(out[0]) == 2  # hole survives, shrunk
    expected = 100 + 40 * R + FULL_FAN - (4 - 2 * R) ** 2
    assert abs(_area(out) - expected) < 1e-9


def test_hole_smaller_than_2r_vanishes():
    out = buffer_polygon(
        [[
            _ring((0, 0), (10, 0), (10, 10), (0, 10)),
            _ring((4, 4), (4, 4.8), (4.8, 4.8), (4.8, 4)),
        ]],
        R,
    )
    assert len(out) == 1 and len(out[0]) == 1  # hole fully absorbed
    assert abs(_area(out) - (100 + 40 * R + FULL_FAN)) < 1e-9


def test_nearby_parts_merge():
    # gap 1.0 < 2r=1.5: the two buffered squares fuse into one polygon
    out = buffer_polygon(
        [
            [_ring((0, 0), (2, 0), (2, 2), (0, 2))],
            [_ring((3, 0), (5, 0), (5, 2), (3, 2))],
        ],
        0.75,
    )
    assert len(out) == 1

    # gap 3.0 > 2r: they stay separate, each the rect closed form
    out = buffer_polygon(
        [
            [_ring((0, 0), (2, 0), (2, 2), (0, 2))],
            [_ring((5, 0), (7, 0), (7, 2), (5, 2))],
        ],
        R,
    )
    assert len(out) == 2
    assert abs(_area(out) - 2 * (4 + 8 * R + FULL_FAN)) < 1e-9
