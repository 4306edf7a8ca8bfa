"""GlobalMercator kernel vs a literal transcription of the reference formulas
(gdal2tiles.py:417-531) using the stdlib math module — independent of numpy.
"""

import math

import numpy as np
import pytest

from gdal_spark.kernels import mercator as M


def ref_latlon_to_meters(lat, lon):
    origin_shift = 2 * math.pi * 6378137 / 2.0
    mx = lon * origin_shift / 180.0
    my = math.log(math.tan((90 + lat) * math.pi / 360.0)) / (math.pi / 180.0)
    return mx, my * origin_shift / 180.0


def ref_meters_to_pixels(mx, my, zoom):
    origin_shift = 2 * math.pi * 6378137 / 2.0
    res = (2 * math.pi * 6378137 / 256) / (2**zoom)
    return (mx + origin_shift) / res, (my + origin_shift) / res


def ref_pixels_to_tile(px, py):
    return int(math.ceil(px / 256.0) - 1), int(math.ceil(py / 256.0) - 1)


LATS = [0.0, 45.0, -45.0, 85.05112878, -85.05112878, 40.71, -23.55, 66.6]
LONS = [0.0, -180.0, 180.0, -74.0, 139.69, 0.1, -0.12]


def test_latlon_to_meters_matches_reference_formula():
    for lat in LATS:
        for lon in LONS:
            mx, my = M.latlon_to_meters(lat, lon)
            rx, ry = ref_latlon_to_meters(lat, lon)
            assert float(mx) == pytest.approx(rx, abs=1e-9)
            assert float(my) == pytest.approx(ry, abs=1e-9)


def test_origin_constants():
    assert M.ORIGIN_SHIFT == pytest.approx(20037508.342789244, abs=1e-6)
    assert M.INITIAL_RESOLUTION == pytest.approx(156543.03392804062, abs=1e-9)


def test_meters_roundtrip():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-85, 85, 1000)
    lon = rng.uniform(-180, 180, 1000)
    mx, my = M.latlon_to_meters(lat, lon)
    lat2, lon2 = M.meters_to_latlon(mx, my)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)


def test_pixels_to_tile_exact_rule():
    # reference rule: tx = ceil(px/256) - 1 → px=0 maps to tile -1, px in
    # (0, 256] maps to 0, px=256.5 maps to 1 (gdal2tiles.py:460-465)
    cases = [0.0, 0.5, 255.9999, 256.0, 256.0000001, 256.5, 511.9, 512.0, 513.0]
    tx, _ = M.pixels_to_tile(np.array(cases), np.array(cases))
    for got, px in zip(tx, cases):
        assert got == ref_pixels_to_tile(px, px)[0]


def test_tile_assignment_matches_reference_composition():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    for zoom in (7, 10, 13, 16):
        tx, ty = M.latlon_to_tile(lat, lon, zoom)
        for i in range(0, 500, 37):
            mx, my = ref_latlon_to_meters(float(lat[i]), float(lon[i]))
            px, py = ref_meters_to_pixels(mx, my, zoom)
            assert (int(tx[i]), int(ty[i])) == ref_pixels_to_tile(px, py)


def test_google_flip_and_quadkey():
    # gdal2tiles.py:511-531
    tx, ty, zoom = 3, 5, 4
    gx, gy = M.tms_to_google(tx, ty, zoom)
    assert (gx, gy) == (3, 10)
    qk = M.quadkey(tx, ty, zoom)
    # independent recomputation
    t_y = (2**zoom - 1) - ty
    expect = ""
    for i in range(zoom, 0, -1):
        digit = 0
        mask = 1 << (i - 1)
        if tx & mask:
            digit += 1
        if t_y & mask:
            digit += 2
        expect += str(digit)
    assert qk == expect
    assert list(M.quadkey_vec([tx], [ty], zoom)) == [expect]


def test_tile_bounds_invert_pixelstometers():
    minx, miny, maxx, maxy = M.tile_bounds(0, 0, 1)
    assert float(minx) == pytest.approx(-M.ORIGIN_SHIFT)
    assert float(maxx) == pytest.approx(0.0, abs=1e-6)


def test_clip_lat():
    assert M.clip_lat(89.9) == pytest.approx(85.05112878)
    assert M.clip_lat(-89.9) == pytest.approx(-85.05112878)
