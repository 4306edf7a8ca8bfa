"""MakeValid kernel: noding + even-odd face reassembly.

Reference pins: autotest/ogr/ogr_geom.py:4079 test_ogr_geom_makevalid —
the bowtie POLYGON ((0 0,10 10,0 10,10 0,0 0)) must become the two
triangles MULTIPOLYGON (((0 0,5 5,10 0,0 0)),((5 5,0 10,10 10,5 5)))
(compared up to ring rotation/orientation, as ogrtest's
check_feature_geometry does)."""

from gdal_spark.kernels.makevalid import make_valid


def _norm_ring(ring):
    """Canonical ring key independent of rotation/orientation."""
    pts = [tuple(p) for p in ring[:-1]]  # drop closing vertex
    best = None
    for seq in (pts, pts[::-1]):
        for k in range(len(seq)):
            cand = tuple(seq[k:] + seq[:k])
            if best is None or cand < best:
                best = cand
    return best


def _norm(polys):
    return sorted(
        tuple(_norm_ring(r) for r in rings) for rings in polys
    )


def _area(rings):
    tot = 0.0
    for r in rings:
        a = 0.0
        for (x1, y1), (x2, y2) in zip(r, r[1:]):
            a += x1 * y2 - x2 * y1
        tot += a / 2.0
    return tot


def test_bowtie_matches_reference_golden():
    out = make_valid([[[(0, 0), (10, 10), (0, 10), (10, 0)]]])
    expected = [
        [[(0, 0), (5, 5), (10, 0), (0, 0)]],
        [[(5, 5), (0, 10), (10, 10), (5, 5)]],
    ]
    assert _norm(out) == _norm(expected)


def test_valid_inputs_pass_through():
    sq = make_valid([[[(0, 0), (1, 0), (1, 0), (1, 1), (0, 1)]]])
    assert _norm(sq) == _norm([[[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]]])
    holed = make_valid(
        [[[(0, 0), (10, 0), (10, 10), (0, 10)], [(2, 2), (2, 4), (4, 4), (4, 2)]]]
    )
    assert len(holed) == 1 and len(holed[0]) == 2
    assert abs(_area(holed[0]) - 96.0) < 1e-9


def test_self_touch_splits():
    out = make_valid([[[(0, 0), (10, 0), (5, 5), (10, 10), (0, 10), (5, 5)]]])
    assert len(out) == 2
    assert abs(sum(_area(p) for p in out) - 50.0) < 1e-9


def test_hole_outside_shell_even_odd():
    out = make_valid(
        [[[(0, 0), (0, 10), (10, 10), (10, 0)], [(5, 5), (15, 10), (15, 0)]]]
    )
    areas = sorted(round(_area(p), 6) for p in out)
    assert areas == [37.5, 87.5]


def test_overlapping_parts_dissolve_to_union():
    out = make_valid(
        [[[(0, 0), (2, 0), (2, 2), (0, 2)]], [[(1, 1), (3, 1), (3, 3), (1, 3)]]]
    )
    assert len(out) == 1 and len(out[0]) == 1
    assert abs(_area(out[0]) - 7.0) < 1e-9


def test_spike_collapses():
    out = make_valid(
        [[[(0, 0), (10, 0), (10, 5), (14, 5), (10, 5), (10, 10), (0, 10)]]]
    )
    assert _norm(out) == _norm(
        [[[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]]]
    )


def test_island_inside_hole():
    out = make_valid(
        [
            [
                [(0, 0), (10, 0), (10, 10), (0, 10)],
                [(2, 2), (2, 8), (8, 8), (8, 2)],
            ],
            [[(4, 4), (6, 4), (6, 6), (4, 6)]],
        ]
    )
    assert sorted(len(p) for p in out) == [1, 2]
    assert abs(sum(_area(p) for p in out) - 68.0) < 1e-9


def test_all_collapsed_returns_empty():
    assert make_valid([[[(0, 0), (5, 0), (0, 0)]]]) == []


def test_cascaded_union_grouped(spark):
    from gdal_spark.kernels import wkb as W
    from gdal_spark.operators.geom import cascaded_union
    from gdal_spark.session import local_df

    def sq(x0, y0, s):
        return [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)]

    rows = [
        ("a", W.polygon_wkb([sq(0, 0, 2)])),
        ("a", W.polygon_wkb([sq(1, 0, 2)])),
        ("b", W.polygon_wkb([sq(0, 0, 1)])),
    ]
    df = local_df(spark, rows, "g string, geometry binary")
    out = {
        r["g"]: W.shoelace_area(bytes(r["geometry"]))
        for r in cascaded_union(df, group_cols=["g"]).collect()
    }
    assert out == {"a": 6.0, "b": 1.0}
