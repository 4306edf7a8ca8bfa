"""Property-based checks of the arrangement kernel's boolean algebra:
for random axis-aligned rectangle sets (integer corners — heavy
coincident/collinear edge stress for the noding), the set-algebra
identities must hold exactly:

    area(A∩B) + area(A∪B) == area(A) + area(B)   (inclusion-exclusion)
    area(A\\B) == area(A) - area(A∩B)
    area(AΔB) == area(A∪B) - area(A∩B)
"""

from hypothesis import given, settings, strategies as st

from gdal_spark.kernels.makevalid import boolean_op, make_valid


def _rect(x0, y0, w, h):
    return [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)]]


def _area(polys):
    t = 0.0
    for rings in polys:
        for r in rings:
            a = 0.0
            for (x1, y1), (x2, y2) in zip(r, r[1:]):
                a += x1 * y2 - x2 * y1
            t += a / 2.0
    return t


rect = st.tuples(
    st.integers(0, 8), st.integers(0, 8), st.integers(1, 6), st.integers(1, 6)
)


@settings(max_examples=60, deadline=None)
@given(st.lists(rect, min_size=1, max_size=3), st.lists(rect, min_size=1, max_size=3))
def test_inclusion_exclusion(ra, rb):
    A = [_rect(*r) for r in ra]
    B = [_rect(*r) for r in rb]
    # dissolve each side first so area(A)/area(B) are well-defined
    a_area = _area(make_valid(A))
    b_area = _area(make_valid(B))
    inter = _area(boolean_op(A, B, "intersection"))
    union = _area(boolean_op(A, B, "union"))
    diff = _area(boolean_op(A, B, "difference"))
    sym = _area(boolean_op(A, B, "symdifference"))
    assert abs((inter + union) - (a_area + b_area)) < 1e-9
    assert abs(diff - (a_area - inter)) < 1e-9
    assert abs(sym - (union - inter)) < 1e-9


@settings(max_examples=40, deadline=None)
@given(st.lists(rect, min_size=1, max_size=3))
def test_wkb_roundtrip(rs):
    """encode(decode) is identity for polygon/multipolygon WKB."""
    import numpy as np

    from gdal_spark.kernels import wkb as W

    geoms = [_rect(*r) for r in rs]
    buf = (
        W.polygon_wkb(geoms[0])
        if len(geoms) == 1
        else W.multipolygon_wkb(geoms)
    )
    back = W.decode_polygons(buf)
    assert len(back) == len(geoms)
    for got, want in zip(back, geoms):
        assert len(got) == len(want)
        for rg, rw in zip(got, want):
            assert np.allclose(np.asarray(rg, dtype=float), np.asarray(rw, dtype=float))


@settings(max_examples=25, deadline=None)
@given(rect, st.sampled_from([0.25, 0.5, 1.0]))
def test_buffer_grows_and_contains(r, rad):
    """buffer(P, r) strictly grows with r and covers every original
    vertex with margin (sampled containment via the area identity:
    P ∩ buffer == P)."""
    from gdal_spark.kernels.geomops import buffer_polygon

    P = _rect(*r)
    b1 = buffer_polygon([P], rad)
    b2 = buffer_polygon([P], rad * 2)
    assert _area(b2) > _area(b1) > _area([P])
    # buffered region contains the original: P ∩ buffer == P by area
    inter = boolean_op([P], b1, "intersection")
    assert abs(_area(inter) - _area([P])) < 1e-9
