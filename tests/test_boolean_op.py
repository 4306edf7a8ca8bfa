"""Per-row geometric set ops on the noded arrangement
(kernels/makevalid.boolean_op): Intersection/Union/Difference/
SymDifference with exact closed-form areas, hole creation, and
multipolygon inputs."""

from gdal_spark.kernels.makevalid import boolean_op, make_valid


def _sq(x0, y0, s):
    return [[(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)]]


def _area(polys):
    t = 0.0
    for rings in polys:
        for r in rings:
            a = 0.0
            for (x1, y1), (x2, y2) in zip(r, r[1:]):
                a += x1 * y2 - x2 * y1
            t += a / 2.0
    return t


def test_overlap_all_ops():
    A, B = [_sq(0, 0, 4)], [_sq(2, 2, 4)]
    assert _area(boolean_op(A, B, "intersection")) == 4.0
    assert _area(boolean_op(A, B, "union")) == 28.0
    assert _area(boolean_op(A, B, "difference")) == 12.0
    assert _area(boolean_op(A, B, "symdifference")) == 24.0


def test_difference_creates_hole():
    d = boolean_op([_sq(0, 0, 6)], [_sq(2, 2, 2)], "difference")
    assert len(d) == 1 and len(d[0]) == 2  # outer + hole
    assert _area(d) == 32.0


def test_identical_and_disjoint():
    assert boolean_op([_sq(0, 0, 3)], [_sq(0, 0, 3)], "difference") == []
    assert _area(
        boolean_op([_sq(0, 0, 2)], [_sq(5, 5, 2)], "union")
    ) == 8.0


def test_multipolygon_difference():
    # two disjoint A parts minus a bar crossing both
    A = [_sq(0, 0, 2), _sq(4, 0, 2)]
    B = [[[(0, 0.5), (6, 0.5), (6, 1.5), (0, 1.5), (0, 0.5)]]]
    d = boolean_op(A, B, "difference")
    # each square loses a 2x1 bar strip -> two pieces each
    assert len(d) == 4
    assert abs(_area(d) - (8 - 2 * 2 * 1)) < 1e-12


def test_make_valid_unchanged():
    bow = [[(0, 0), (10, 10), (0, 10), (10, 0), (0, 0)]]
    assert len(make_valid([bow])) == 2
