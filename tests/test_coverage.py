"""simplify-coverage: shared-arc consistency, junction pinning."""

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.coverage import simplify_coverage
from gdal_spark.session import local_df

ZIG = [(4, 0), (4.2, 1), (3.8, 2), (4.2, 3), (3.8, 4), (4.2, 5), (4, 6)]


def _two_zones(spark):
    a = [(0, 0)] + ZIG + [(0, 6)]
    b = [(4, 0), (8, 0), (8, 6), (4, 6)] + list(reversed(ZIG))[1:-1]
    return local_df(
        spark,
        [(1, W.polygon_wkb([a])), (2, W.polygon_wkb([b]))],
        "zone_id int, geometry binary",
    )


def _rings(out):
    rings = {}
    for r in out.collect():
        rings.setdefault((r["zone_id"], r["ring_idx"]), []).append(
            (r["vidx"], r["x"], r["y"])
        )
    return {
        k: [(x, y) for _, x, y in sorted(v)] for k, v in rings.items()
    }


def _area(ring):
    n = len(ring)
    s = 0.0
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2.0


def test_shared_arc_simplified_identically(spark):
    rings = _rings(simplify_coverage(_two_zones(spark), 0.5))
    a, b = rings[(1, 0)], rings[(2, 0)]
    # coverage preserved: areas tile the full 8x6 box exactly
    assert abs(_area(a) + _area(b) - 48.0) < 1e-9
    shared_a = {p for p in a if p[0] == 4.0}
    shared_b = {p for p in b if p[0] == 4.0}
    assert shared_a == shared_b == {(4.0, 0.0), (4.0, 6.0)}


def test_small_tolerance_keeps_wiggles(spark):
    rings = _rings(simplify_coverage(_two_zones(spark), 0.05))
    a, b = rings[(1, 0)], rings[(2, 0)]
    # amplitude 0.2 > tol 0.05: every zigzag vertex survives, and both
    # sides keep the identical vertex set on the shared boundary
    sa = {p for p in a if 3.7 <= p[0] <= 4.3}
    sb = {p for p in b if 3.7 <= p[0] <= 4.3}
    assert sa == sb and len(sa) == len(ZIG)
    assert abs(_area(a) + _area(b) - 48.0) < 1e-9


def test_three_zone_junction_pinned(spark):
    # three zones meet at (4,3): the junction is an arc endpoint, so it
    # survives even though its perpendicular deviation from the
    # surrounding boundary is below tolerance
    top_l = [(0, 3), (4, 3), (4.2, 4), (3.8, 5), (4, 6), (0, 6)]
    top_r = [(4, 3), (8, 3), (8, 6), (4, 6), (3.8, 5), (4.2, 4)]
    bot = [(0, 0), (8, 0), (8, 3), (4, 3), (0, 3)]
    df = local_df(
        spark,
        [
            (1, W.polygon_wkb([top_l])),
            (2, W.polygon_wkb([top_r])),
            (3, W.polygon_wkb([bot])),
        ],
        "zone_id int, geometry binary",
    )
    rings = _rings(simplify_coverage(df, 0.5))
    for z in (1, 2, 3):
        assert (4.0, 3.0) in set(rings[(z, 0)])
    total = sum(_area(rings[(z, 0)]) for z in (1, 2, 3))
    assert abs(total - 48.0) < 1e-9
