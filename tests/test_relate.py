"""DE-9IM predicate kernel vs hand-derived truth tables (the reference's
ST_* set: Intersects/Equals/Disjoint/Touches/Crosses/Within/Contains/
Overlaps — ogrsqlitesqlfunctions.cpp:876-884 semantics via GEOS)."""

import pytest

from gdal_spark.kernels import wkb as W
from gdal_spark.kernels.relate import relate_wkb


def LS(*pts):
    return W.linestring_wkb(pts)


def SQ(x0, y0, s):
    return W.polygon_wkb(
        [[(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)]]
    )


def P(x, y):
    return W.point_wkb(x, y)


def _check(a, b, **want):
    got = relate_wkb(a, b)
    for k, v in want.items():
        assert got[k] == v, (k, got)


# ---------------------------------------------------------------- L x L

def test_lines_proper_cross():
    _check(
        LS((0, 0), (2, 2)), LS((0, 2), (2, 0)),
        intersects=True, crosses=True, touches=False, overlaps=False,
        within=False, equals=False, disjoint=False,
    )


def test_lines_endpoint_touch():
    _check(
        LS((0, 0), (1, 1)), LS((1, 1), (2, 0)),
        intersects=True, touches=True, crosses=False, overlaps=False,
    )


def test_lines_t_touch_interior():
    # endpoint of b meets INTERIOR of a: BI contact, still touches
    _check(
        LS((0, 0), (2, 0)), LS((1, 0), (1, 1)),
        intersects=True, touches=True, crosses=False,
    )


def test_lines_partial_overlap():
    _check(
        LS((0, 0), (2, 0)), LS((1, 0), (3, 0)),
        intersects=True, overlaps=True, crosses=False, touches=False,
        within=False, equals=False,
    )


def test_lines_within_equals():
    _check(
        LS((1, 0), (2, 0)), LS((0, 0), (3, 0)),
        within=True, contains=False, equals=False, overlaps=False,
        crosses=False, touches=False,
    )
    _check(
        LS((0, 0), (3, 0)), LS((0, 0), (3, 0)),
        equals=True, within=True, contains=True, overlaps=False,
    )


def test_lines_cross_and_overlap_is_overlap():
    # shared section (dim 1) dominates: II dim = 1 -> not crosses
    _check(
        LS((0, 0), (2, 0), (2, 2)), LS((1, 0), (3, 0)),
        overlaps=True, crosses=False,
    )


def test_lines_disjoint():
    _check(
        LS((0, 0), (1, 0)), LS((0, 1), (1, 1)),
        disjoint=True, intersects=False, touches=False,
    )


# ---------------------------------------------------------------- L x A

def test_line_crosses_polygon():
    _check(
        LS((-1, 1), (3, 1)), SQ(0, 0, 2),
        crosses=True, intersects=True, touches=False, within=False,
    )
    # transpose: polygon crossed BY line
    _check(
        SQ(0, 0, 2), LS((-1, 1), (3, 1)),
        crosses=True, intersects=True, contains=False,
    )


def test_line_within_polygon():
    _check(
        LS((0.5, 0.5), (1.5, 1.5)), SQ(0, 0, 2),
        within=True, crosses=False, touches=False, intersects=True,
    )
    _check(
        SQ(0, 0, 2), LS((0.5, 0.5), (1.5, 1.5)),
        contains=True, within=False,
    )


def test_line_on_polygon_boundary_touches():
    # line lies entirely ON the shell: II empty -> touches, not within
    _check(
        LS((0, 0), (2, 0)), SQ(0, 0, 2),
        touches=True, within=False, crosses=False, intersects=True,
    )


def test_line_touch_at_corner():
    _check(
        LS((-1, -1), (0, 0)), SQ(0, 0, 2),
        touches=True, crosses=False,
    )


def test_line_enters_and_returns():
    # dips into the square and back out: interior AND exterior -> crosses
    _check(
        LS((-1, 1), (1, 1), (-1, 1.5)), SQ(0, 0, 2),
        crosses=True,
    )


def test_line_polygon_disjoint():
    _check(LS((5, 5), (6, 6)), SQ(0, 0, 2), disjoint=True)


# ---------------------------------------------------------------- P x *

def test_point_cases():
    _check(P(1, 1), SQ(0, 0, 2), within=True, intersects=True, touches=False)
    _check(P(0, 1), SQ(0, 0, 2), touches=True, within=False)
    _check(P(5, 5), SQ(0, 0, 2), disjoint=True)
    _check(P(1, 0), LS((0, 0), (2, 0)), within=True, touches=False)
    _check(P(0, 0), LS((0, 0), (2, 0)), touches=True, within=False)
    _check(P(1, 1), P(1, 1), equals=True, intersects=True)
    _check(P(1, 1), P(2, 2), disjoint=True)
    _check(SQ(0, 0, 2), P(1, 1), contains=True, within=False)


# ---------------------------------------------------------------- A x A

def test_polygons():
    _check(SQ(0, 0, 2), SQ(1, 1, 2), overlaps=True, crosses=False,
           touches=False, within=False)
    _check(SQ(0, 0, 3), SQ(1, 1, 1), contains=True, overlaps=False)
    _check(SQ(1, 1, 1), SQ(0, 0, 3), within=True)
    _check(SQ(0, 0, 1), SQ(1, 0, 1), touches=True, overlaps=False,
           intersects=True, disjoint=False)
    _check(SQ(0, 0, 1), SQ(5, 5, 1), disjoint=True)
    _check(SQ(0, 0, 2), SQ(0, 0, 2), equals=True, within=True, contains=True,
           overlaps=False, touches=False)


# ------------------------------------------------- property: symmetry

from hypothesis import HealthCheck, given, settings, strategies as st

seg = st.tuples(
    st.integers(0, 6), st.integers(0, 6), st.integers(0, 6), st.integers(0, 6)
).filter(lambda s: (s[0], s[1]) != (s[2], s[3]))


@settings(max_examples=150, deadline=None, suppress_health_check=list(HealthCheck))
@given(seg, seg)
def test_line_line_symmetry(sa, sb):
    """intersects/touches/crosses/overlaps/equals are symmetric;
    within(a,b) == contains(b,a); disjoint == not intersects."""
    a = LS((sa[0], sa[1]), (sa[2], sa[3]))
    b = LS((sb[0], sb[1]), (sb[2], sb[3]))
    ab = relate_wkb(a, b)
    ba = relate_wkb(b, a)
    for p in ("intersects", "touches", "crosses", "overlaps", "equals",
              "disjoint"):
        assert ab[p] == ba[p], (p, sa, sb, ab, ba)
    assert ab["within"] == ba["contains"], (sa, sb)
    assert ab["contains"] == ba["within"], (sa, sb)
    assert ab["disjoint"] == (not ab["intersects"])
    # touches and crosses and overlaps are mutually exclusive
    assert ab["touches"] + ab["crosses"] + ab["overlaps"] <= 1


@settings(max_examples=100, deadline=None, suppress_health_check=list(HealthCheck))
@given(seg, st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(1, 3)))
def test_line_poly_transpose_consistency(sa, sq):
    a = LS((sa[0], sa[1]), (sa[2], sa[3]))
    b = SQ(sq[0], sq[1], sq[2])
    ab = relate_wkb(a, b)
    ba = relate_wkb(b, a)
    for p in ("intersects", "touches", "crosses", "equals", "disjoint"):
        assert ab[p] == ba[p], (p, sa, sq, ab, ba)
    assert ab["within"] == ba["contains"]
    assert ab["contains"] == ba["within"]
    assert not ab["contains"]  # a 1-D line never contains a 2-D polygon


# ----------------------------------------------------------- MultiPoint

def MP(*pts):
    return W.multipoint_wkb(pts)


def test_multipoint_vs_polygon():
    # one member inside, one outside: intersects but neither within nor
    # touches (interior reaches both sides)
    _check(
        MP((0.5, 0.5), (5, 5)), SQ(0, 0, 1),
        intersects=True, within=False, touches=False, disjoint=False,
    )
    # all members inside -> within
    _check(
        MP((0.2, 0.2), (0.8, 0.8)), SQ(0, 0, 1),
        within=True, intersects=True, touches=False,
    )
    # all members ON the boundary -> touches, not within
    _check(
        MP((0.5, 0), (1, 0.5)), SQ(0, 0, 1),
        touches=True, intersects=True, within=False,
    )
    # transpose: polygon contains multipoint
    _check(
        SQ(0, 0, 1), MP((0.2, 0.2), (0.8, 0.8)),
        contains=True, intersects=True,
    )


def test_multipoint_vs_multipoint():
    _check(
        MP((0, 0), (1, 1)), MP((1, 1), (2, 2)),
        intersects=True, equals=False, within=False, overlaps=True,
    )
    _check(MP((0, 0), (1, 1)), MP((1, 1), (0, 0)), equals=True)
    _check(MP((0, 0),), MP((1, 1),), disjoint=True)
    # subset: within but not equals
    _check(
        MP((0, 0),), MP((0, 0), (1, 1)),
        within=True, equals=False, intersects=True,
    )


def test_multipoint_vs_line():
    # one member at line interior, one off the line
    _check(
        MP((1, 0), (5, 5)), LS((0, 0), (2, 0)),
        intersects=True, within=False, touches=False,
    )
    # member at a line ENDPOINT only -> boundary contact -> touches
    _check(
        MP((0, 0), (5, 5)), LS((0, 0), (2, 0)),
        touches=True, intersects=True,
    )
