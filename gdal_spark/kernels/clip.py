"""Polygon-vs-rectangle intersection (Sutherland–Hodgman half-plane
clipping), the geometric core of the engine's layer-algebra overlay:

  * OGRLayer::Clip / ::Intersection (/root/reference/ogr/ogrlayer.cpp:5497,
    :3345) with a rectangular method geometry — the fishnet-overlay /
    bbox-clip case (`gdal vector clip` pipeline step,
    apps/gdalalg_vector_clip.cpp) — computed exactly: a rectangle is a
    convex clip region, so successive half-plane clipping of each ring is
    exact for ARBITRARY subject polygons (holes clip ring-by-ring and
    subtract by area additivity).

General polygon-vs-polygon geometry output (Weiler–Atherton class) is out
of scope this round; membership/area vs rectangles covers the fishnet
and clip workloads.
"""

from __future__ import annotations

import numpy as np


def _clip_half(pts, inside, intersect):
    """One Sutherland–Hodgman pass. pts: list of (x, y), open ring."""
    if not pts:
        return pts
    out = []
    n = len(pts)
    for i in range(n):
        cur, prev = pts[i], pts[i - 1]
        cin, pin = inside(cur), inside(prev)
        if cin:
            if not pin:
                out.append(intersect(prev, cur))
            out.append(cur)
        elif pin:
            out.append(intersect(prev, cur))
    return out


def clip_ring_rect(ring, minx, miny, maxx, maxy):
    """Clip one ring (sequence of (x, y), open or closed) to a rect.
    Returns an OPEN list of vertices (possibly empty/degenerate)."""
    pts = [(float(x), float(y)) for x, y in ring]
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]

    def ix_x(p, q, x):  # intersection with vertical line
        t = (x - p[0]) / (q[0] - p[0])
        return (x, p[1] + t * (q[1] - p[1]))

    def ix_y(p, q, y):
        t = (y - p[1]) / (q[1] - p[1])
        return (p[0] + t * (q[0] - p[0]), y)

    pts = _clip_half(pts, lambda p: p[0] >= minx, lambda p, q: ix_x(p, q, minx))
    pts = _clip_half(pts, lambda p: p[0] <= maxx, lambda p, q: ix_x(p, q, maxx))
    pts = _clip_half(pts, lambda p: p[1] >= miny, lambda p, q: ix_y(p, q, miny))
    pts = _clip_half(pts, lambda p: p[1] <= maxy, lambda p, q: ix_y(p, q, maxy))
    # vertices exactly on a clip line re-emit themselves: drop consecutive
    # duplicates (incl. the wrap pair)
    out = [p for i, p in enumerate(pts) if p != pts[i - 1]]
    return out


def _shoelace(pts) -> float:
    if len(pts) < 3:
        return 0.0
    a = 0.0
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        a += x1 * y2 - x2 * y1
    return abs(a) / 2.0


def clip_polygons_rect(polys, minx, miny, maxx, maxy):
    """Clip a decoded (multi)polygon (list of list-of-ring-arrays, outer
    first) to a rect. Returns (area, rings) where rings are the clipped
    outer rings and hole rings (for WKB re-encoding; degenerate parts
    dropped) and area = sum of outer areas minus hole areas."""
    area = 0.0
    out_rings = []
    for rings in polys:
        for ri, ring in enumerate(rings):
            pts = clip_ring_rect(ring, minx, miny, maxx, maxy)
            a = _shoelace(pts)
            if ri == 0:
                area += a
            else:
                area -= a
            if a > 0.0:
                out_rings.append((ri == 0, pts))
    return area, out_rings
