"""Geotransform, checksum, hex cells, S2 cells."""

import numpy as np
import pytest

from gdal_spark.kernels import checksum as CK
from gdal_spark.kernels import geotransform as GT
from gdal_spark.kernels import hexcell as HX
from gdal_spark.kernels import s2cell as S2

BYTE_TIF_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def ref_checksum(vals):
    """Scalar transcription of gdalchecksum.cpp accumulate loop."""
    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    n = 0
    for i, v in enumerate(vals):
        v = int(v)
        r = abs(v) % primes[i % 11]
        n += r if v >= 0 else -r
        n &= 0xFFFF
    return n


class TestGeotransform:
    def test_apply(self):
        x, y = GT.apply_geotransform(BYTE_TIF_GT, 0, 0)
        assert (x, y) == (440720.0, 3751320.0)
        x, y = GT.apply_geotransform(BYTE_TIF_GT, 20, 20)
        assert (x, y) == (440720.0 + 1200.0, 3751320.0 - 1200.0)

    def test_invert_fast_path_roundtrip(self):
        inv = GT.inv_geotransform(BYTE_TIF_GT)
        px, py = GT.apply_geotransform(inv, 440720.0 + 90.0, 3751320.0 - 90.0)
        assert px == pytest.approx(1.5)
        assert py == pytest.approx(1.5)

    def test_invert_rotated_roundtrip(self):
        gt = (100.0, 2.0, 0.5, 200.0, -0.25, -3.0)
        inv = GT.inv_geotransform(gt)
        for p, l in [(0, 0), (7, 3), (-2, 11.5)]:
            x, y = GT.apply_geotransform(gt, p, l)
            p2, l2 = GT.apply_geotransform(inv, x, y)
            assert p2 == pytest.approx(p, abs=1e-9)
            assert l2 == pytest.approx(l, abs=1e-9)

    def test_uninvertible(self):
        with pytest.raises(ValueError):
            GT.inv_geotransform((0.0, 1.0, 2.0, 0.0, 2.0, 4.0))


class TestChecksum:
    def test_matches_scalar_reference(self):
        rng = np.random.default_rng(42)
        vals = rng.integers(0, 256, size=400)
        assert CK.checksum(vals.reshape(20, 20)) == ref_checksum(vals)

    def test_negative_values(self):
        vals = np.array([-5, -100, 3, 255, -43, 17], dtype=np.int32)
        assert CK.checksum(vals) == ref_checksum(vals)

    def test_float_conversion_rule(self):
        # val + 0.5 then floor (GDALCopyWords float->Int32)
        vals = np.array([0.4, 0.5, 0.6, -0.4, -0.5, -0.6, 1e10, -1e10, np.nan])
        conv = CK._float_to_int32(vals)
        # floor(-0.6 + 0.5) = floor(-0.1) = -1 (reference floors, not truncates)
        assert conv[:6].tolist() == [0, 1, 1, 0, 0, -1]
        assert conv[6] == 2147483647
        assert conv[7] == -2147483647
        assert conv[8] == np.iinfo(np.int32).min

    def test_wraps_16bit(self):
        vals = np.full(100000, 255, dtype=np.int64)
        got = CK.checksum(vals)
        assert 0 <= got <= 0xFFFF
        assert got == ref_checksum(vals)


class TestHexCell:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(1)
        res = rng.integers(0, 16, 100)
        q = rng.integers(-(10**6), 10**6, 100)
        r = rng.integers(-(10**6), 10**6, 100)
        res2, q2, r2 = HX.unpack(HX.pack(res, q, r))
        np.testing.assert_array_equal(res2, res)
        np.testing.assert_array_equal(q2, q)
        np.testing.assert_array_equal(r2, r)

    def test_cell_assignment_deterministic_and_local(self):
        lat = np.array([40.71, 40.71, 40.7100001, 51.5])
        lon = np.array([-74.0, -74.0, -74.0000001, -0.12])
        c = HX.latlon_to_cell(lat, lon, 9)
        assert c[0] == c[1]
        assert c[0] == c[2]  # 1e-7 deg apart -> same res-9 hex
        assert c[0] != c[3]

    def test_kring_counts_and_contains_self(self):
        c = HX.latlon_to_cell(np.array([40.71]), np.array([-74.0]), 8)
        for k in (1, 2, 3):
            ring = HX.k_ring(c, k)
            assert ring.shape == (1, 1 + 3 * k * (k + 1))
            assert c[0] in ring[0]
            assert len(set(ring[0].tolist())) == ring.shape[1]

    def test_neighbors_are_adjacent_in_meters(self):
        c = HX.latlon_to_cell(np.array([10.0]), np.array([20.0]), 7)
        ring1 = HX.k_ring(c, 1)[0]
        res, q, r = HX.unpack(ring1)
        mx, my = HX.axial_to_meters(q, r, 7)
        d = np.hypot(mx - mx[0], my - my[0])[1:]
        s = float(HX.hex_size(7))
        np.testing.assert_allclose(d, s * np.sqrt(3), rtol=1e-9)

    def test_parent_mostly_consistent(self):
        rng = np.random.default_rng(3)
        lat = rng.uniform(-60, 70, 2000)
        lon = rng.uniform(-180, 180, 2000)
        child = HX.latlon_to_cell(lat, lon, 10)
        direct = HX.latlon_to_cell(lat, lon, 7)
        via_parent = HX.parent(child, 7)
        # hex hierarchies are approximate; expect high (not perfect) agreement
        agree = (direct == via_parent).mean()
        assert agree > 0.85

    def test_aperture7_scaling(self):
        assert float(HX.hex_size(8) / HX.hex_size(9)) == pytest.approx(np.sqrt(7))


class TestS2:
    def test_leaf_structure(self):
        cid = S2.latlon_to_leaf(np.array([0.0]), np.array([0.0]))
        # face 0 center: pos = 2^59, id = 2^60 + 1 (hand-derived from the
        # Hilbert tables: first bit-pair ij=3 -> pos digit 2, rest 0)
        assert int(cid[0]) == (1 << 60) + 1

    def test_face_assignment(self):
        cases = [
            ((0.0, 0.0), 0),
            ((0.0, 90.0), 1),
            ((90.0, 0.0), 2),
            ((0.0, 180.0), 3),
            ((0.0, -90.0), 4),
            ((-90.0, 0.0), 5),
        ]
        for (lat, lon), face in cases:
            cid = S2.latlon_to_leaf(np.array([lat]), np.array([lon]))
            assert int(np.uint64(cid[0]) >> np.uint64(61)) == face, (lat, lon)

    def test_level_and_parent(self):
        cid = S2.latlon_to_leaf(np.array([40.71]), np.array([-74.0]))
        assert S2.cell_level(cid)[0] == 30
        for lvl in (16, 14, 12):
            p = S2.parent_at(cid, lvl)
            assert S2.cell_level(p)[0] == lvl
            # parent of parent == direct ancestor
            assert S2.parent_at(p, 10)[0] == S2.parent_at(cid, 10)[0]

    def test_nearby_points_share_coarse_cell(self):
        lat = np.array([40.71, 40.7100001])
        lon = np.array([-74.0, -74.0000001])
        c12 = S2.latlon_to_cell(lat, lon, 12)
        assert c12[0] == c12[1]
        far = S2.latlon_to_cell(np.array([40.71, -23.55]), np.array([-74.0, -46.63]), 12)
        assert far[0] != far[1]

    def test_hilbert_locality(self):
        # consecutive tiny steps along a line change the leaf id only in low bits
        lat = np.full(10, 10.0)
        lon = 20.0 + np.arange(10) * 1e-7
        leafs = S2.latlon_to_leaf(lat, lon)
        l16 = S2.parent_at(leafs, 16)
        assert len(np.unique(l16)) <= 2

    def test_token(self):
        cid = S2.latlon_to_leaf(np.array([0.0]), np.array([0.0]))[0]
        assert S2.token(cid) == "1000000000000001"


class TestDelaunay:
    def test_empty_circumcircle_property(self):
        """No point lies strictly inside any triangle's circumcircle —
        the defining Delaunay property — on an irregular point set."""
        import random

        from gdal_spark.kernels.delaunay import _circumcircle_contains, _ccw, delaunay

        rng = random.Random(11)
        pts = [(rng.uniform(0, 100), rng.uniform(0, 100)) for _ in range(60)]
        tris = delaunay(pts)
        assert len(tris) > 0
        for (a, b, c) in tris:
            aa, bb, cc = pts[a], pts[b], pts[c]
            if not _ccw(pts, a, b, c):
                aa, cc = cc, aa
            for i, p in enumerate(pts):
                if i in (a, b, c):
                    continue
                assert not _circumcircle_contains(*aa, *bb, *cc, *p), (a, b, c, i)

    def test_triangle_count_euler(self):
        """For n points with h on the hull: triangles = 2n - h - 2."""
        import random

        from gdal_spark.kernels.delaunay import delaunay
        from gdal_spark.kernels.geomops import convex_hull

        rng = random.Random(7)
        pts = [(rng.uniform(0, 10), rng.uniform(0, 10)) for _ in range(50)]
        tris = delaunay(pts)
        h = len(convex_hull(pts)) - 1
        assert len(tris) == 2 * len(pts) - h - 2
