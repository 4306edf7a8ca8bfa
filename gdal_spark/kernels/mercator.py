"""GlobalMercator (EPSG:4326 <-> EPSG:3857 + XYZ tile pyramid) closed forms.

Reproduces the reference's spherical-mercator math verbatim:
/root/reference/swig/python/gdal-utils/osgeo_utils/gdal2tiles.py
  :417-420  initialResolution = 2*pi*6378137/tile_size, originShift = 2*pi*6378137/2
  :422-429  LatLonToMeters
  :431-442  MetersToLatLon
  :444-458  PixelsToMeters / MetersToPixels
  :460-465  PixelsToTile  (tx = ceil(px/tile_size) - 1)
  :497-501  Resolution(zoom) = initialResolution / 2**zoom
  :511-515  GoogleTile      (ty_google = (2**zoom - 1) - ty_tms)
  :517-531  QuadTree quadkey
  :349      +/-85.05112878 latitude clip (polar areas clipped off)

All functions are vectorized over numpy arrays and also accept scalars.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0
TILE_SIZE = 256
ORIGIN_SHIFT = 2 * np.pi * EARTH_RADIUS / 2.0  # 20037508.342789244
INITIAL_RESOLUTION = 2 * np.pi * EARTH_RADIUS / TILE_SIZE  # 156543.03392804062
MAX_LATITUDE = 85.05112878  # gdal2tiles.py:349
MAX_ZOOM = 32


def clip_lat(lat):
    """Clamp latitude to the Web-Mercator valid band (gdal2tiles.py:349)."""
    return np.clip(lat, -MAX_LATITUDE, MAX_LATITUDE)


def latlon_to_meters(lat, lon):
    """WGS84 lat/lon -> spherical-mercator meters (gdal2tiles.py:422-429)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / (np.pi / 180.0)
    my = my * ORIGIN_SHIFT / 180.0
    return mx, my


def meters_to_latlon(mx, my):
    """Spherical-mercator meters -> WGS84 lat/lon (gdal2tiles.py:431-442)."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = (mx / ORIGIN_SHIFT) * 180.0
    lat = (my / ORIGIN_SHIFT) * 180.0
    lat = 180.0 / np.pi * (2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0)
    return lat, lon


def resolution(zoom):
    """Meters/pixel at given zoom, measured at the equator (gdal2tiles.py:497-501)."""
    return INITIAL_RESOLUTION / (2 ** np.asarray(zoom))


def meters_to_pixels(mx, my, zoom):
    """EPSG:3857 meters -> global pixel coords at zoom (gdal2tiles.py:452-458)."""
    res = resolution(zoom)
    px = (np.asarray(mx, dtype=np.float64) + ORIGIN_SHIFT) / res
    py = (np.asarray(my, dtype=np.float64) + ORIGIN_SHIFT) / res
    return px, py


def pixels_to_meters(px, py, zoom):
    """Global pixel coords at zoom -> EPSG:3857 meters (gdal2tiles.py:444-450)."""
    res = resolution(zoom)
    mx = np.asarray(px, dtype=np.float64) * res - ORIGIN_SHIFT
    my = np.asarray(py, dtype=np.float64) * res - ORIGIN_SHIFT
    return mx, my


def pixels_to_tile(px, py):
    """Pixel coords -> covering TMS tile (gdal2tiles.py:460-465).

    Exact rule: tx = int(ceil(px / tile_size) - 1).
    """
    tx = (np.ceil(np.asarray(px, dtype=np.float64) / float(TILE_SIZE)) - 1).astype(np.int64)
    ty = (np.ceil(np.asarray(py, dtype=np.float64) / float(TILE_SIZE)) - 1).astype(np.int64)
    return tx, ty


def meters_to_tile(mx, my, zoom):
    """EPSG:3857 meters -> TMS tile (gdal2tiles.py:483-487)."""
    px, py = meters_to_pixels(mx, my, zoom)
    return pixels_to_tile(px, py)


def latlon_to_tile(lat, lon, zoom):
    """lat/lon -> TMS tile at zoom (composition used by gdal2tiles)."""
    mx, my = latlon_to_meters(lat, lon)
    return meters_to_tile(mx, my, zoom)


def tms_to_google(tx, ty, zoom):
    """TMS -> Google/XYZ tile y-flip (gdal2tiles.py:511-515)."""
    return tx, (2 ** np.asarray(zoom) - 1) - np.asarray(ty)


def tile_bounds(tx, ty, zoom):
    """TMS tile -> EPSG:3857 bounds (minx, miny, maxx, maxy) (gdal2tiles.py:489-495)."""
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    minx, miny = pixels_to_meters(tx * TILE_SIZE, ty * TILE_SIZE, zoom)
    maxx, maxy = pixels_to_meters((tx + 1) * TILE_SIZE, (ty + 1) * TILE_SIZE, zoom)
    return minx, miny, maxx, maxy


def quadkey(tx, ty, zoom):
    """TMS tile -> Microsoft QuadTree key (gdal2tiles.py:517-531). Scalar ints."""
    tx = int(tx)
    ty = (2**int(zoom) - 1) - int(ty)
    out = []
    for i in range(int(zoom), 0, -1):
        digit = 0
        mask = 1 << (i - 1)
        if tx & mask:
            digit += 1
        if ty & mask:
            digit += 2
        out.append(str(digit))
    return "".join(out)


def quadkey_vec(tx, ty, zoom: int):
    """Vectorized quadkey for a fixed zoom -> numpy array of strings."""
    tx = np.asarray(tx, dtype=np.int64)
    tyg = (2**int(zoom) - 1) - np.asarray(ty, dtype=np.int64)
    n = tx.shape[0]
    digits = np.zeros((n, int(zoom)), dtype=np.int8)
    for col, i in enumerate(range(int(zoom), 0, -1)):
        mask = 1 << (i - 1)
        digits[:, col] = ((tx & mask) != 0) + 2 * ((tyg & mask) != 0)
    return np.array(["".join(map(str, row)) for row in digits], dtype=object)


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters on the GDAL sphere (R=6378137).

    Matches the geodesic-length intent of ogrsqlitesqlfunctions.cpp ST_Length;
    used for kNN re-ranking (SURVEY.md §2.3).
    """
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS * np.arcsin(np.sqrt(a))
