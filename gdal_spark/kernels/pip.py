"""Ray-cast point-in-polygon, bit-exact to the reference rule.

Reproduces /root/reference/ogr/ogrlinearring.cpp:453-531 (isPointInRing):
  * envelope pretest: point must satisfy minx<=x<=maxx and miny<=y<=maxy;
  * for each ring segment (p[i-1], p[i]) in test-point-relative coords
    (x1,y1)=(p[i]-pt), (x2,y2)=(p[i-1]-pt): the upward ray crosses iff
    ((y1>0) != (y2>0) treating 0 as non-positive, i.e.
    (y1>0 && y2<=0) || (y2>0 && y1<=0)) and the x-intercept
    (x1*y2 - x2*y1)/(y2 - y1) is STRICTLY > 0;
  * odd crossing count => inside.
Polygon-with-holes semantics per OGRPolygon::Contains via GEOS fallback /
OGRLayer::FilterGeometry usage: inside outer ring AND inside no hole ring.
MultiPolygon: inside any member polygon.

Vectorized: `points_in_rings` tests M points against one ring in O(M*N) numpy
ops with no Python-level per-point loop — this is the pandas_udf inner kernel.
"""

from __future__ import annotations

import numpy as np

from . import wkb as _wkb


def points_in_ring(px, py, ring) -> np.ndarray:
    """Vector of booleans: ray-cast crossing parity of (px[i], py[i]) vs ring.

    ring: (N, 2) array, closed or open (reference rings are closed; an open
    ring misses its last segment exactly like the reference loop would).
    No envelope pretest here — callers compose it (two-phase filter,
    ogrlayer.cpp:2253-2325).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    rx = np.asarray(ring[:, 0], dtype=np.float64)
    ry = np.asarray(ring[:, 1], dtype=np.float64)
    n = rx.shape[0]
    if n < 4:  # "Simple validation" ogrlinearring.cpp:481
        return np.zeros(px.shape, dtype=bool)

    # Relative coords: segment endpoints minus test point, broadcast (M, N).
    # x1/y1 = current vertex (iPoint), x2/y2 = previous vertex.
    x1 = rx[None, 1:] - px[:, None]
    y1 = ry[None, 1:] - py[:, None]
    x2 = rx[None, :-1] - px[:, None]
    y2 = ry[None, :-1] - py[:, None]

    straddle = ((y1 > 0) & (y2 <= 0)) | ((y2 > 0) & (y1 <= 0))
    denom = y2 - y1
    with np.errstate(divide="ignore", invalid="ignore"):
        intersection = (x1 * y2 - x2 * y1) / denom
    crossings = straddle & (intersection > 0.0)  # strict, :519
    return (crossings.sum(axis=1) % 2).astype(bool)


def points_in_polygon(px, py, rings) -> np.ndarray:
    """Inside outer ring and not inside any hole (odd-even per ring)."""
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        if not inside.any():
            break
        inside &= ~points_in_ring(px, py, hole)
    return inside


def points_in_wkb(px, py, geom_wkb: bytes, test_envelope: bool = True) -> np.ndarray:
    """Point-in-(multi)polygon over a WKB buffer, two-phase like
    OGRLayer::FilterGeometry: envelope reject then exact ray cast."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    result = np.zeros(px.shape, dtype=bool)
    if test_envelope:
        minx, miny, maxx, maxy = _wkb.envelope(geom_wkb)
        cand = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
    else:
        cand = np.ones(px.shape, dtype=bool)
    if not cand.any():
        return result
    cpx, cpy = px[cand], py[cand]
    hit = np.zeros(cpx.shape, dtype=bool)
    for rings in _wkb.decode_polygons(geom_wkb):
        hit |= points_in_polygon(cpx, cpy, rings)
    result[cand] = hit
    return result
