"""Geometry transform kernels: convex hull, simplify (Douglas-Peucker),
segmentize, point buffer.

Re-expresses the reference's geometry-transform surface
(/root/reference/ogr/ogrgeometry.cpp: ConvexHull :4188, Simplify :6362,
Segmentize; sqlite dialect ST_Buffer ogrsqlitesqlfunctions.cpp:997):

  * convex_hull — Andrew monotone chain (exact planar hull; the
    reference delegates to GEOS, same mathematical hull);
  * simplify — classic Douglas-Peucker (GEOSSimplify semantics: drop
    vertices whose perpendicular distance from the chord is <= tol;
    ring start/end vertices are anchored);
  * segmentize — insert intermediate vertices so no segment exceeds
    max_len (OGRGeometry::segmentize semantics);
  * buffer_point — circular buffer approximated with 8 segments per
    quadrant (GEOS default quadsegs), vertices at angles 2*pi*k/(4*qs)
    counter-clockwise from +x (our documented convention; GEOS's
    start/orientation differs but the vertex SET geometry matches the
    same approximation);
  * buffer_polygon — positive buffer of a (multi)polygon as the
    Minkowski dilation by the same discretized disk: union of the
    polygon, a 2r-wide rectangle swept along every edge, and a full
    disk K-gon at every vertex, resolved by the make-valid planar
    arrangement (a point is buffered iff ANY piece covers it). Holes
    shrink, nearby parts merge — the sqlite-dialect ST_Buffer
    (ogrsqlitesqlfunctions.cpp:997 -> GEOS buffer) observable behavior
    under a documented disk discretization.
"""

from __future__ import annotations

import math

import numpy as np


def convex_hull(points) -> list:
    """Monotone-chain hull of (x, y) points; returns CCW closed ring."""
    pts = sorted(set((float(x), float(y)) for x, y in points))
    if len(pts) <= 2:
        return pts + pts[:1]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    ring = lower[:-1] + upper[:-1]
    ring.append(ring[0])
    return ring


def _perp_dist(p, a, b) -> float:
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    if L2 == 0.0:
        return math.hypot(px - ax, py - ay)
    return abs(dx * (py - ay) - dy * (px - ax)) / math.sqrt(L2)


def simplify(line, tol: float) -> list:
    """Douglas-Peucker on an open polyline or closed ring (first == last
    kept as anchors)."""
    pts = [(float(x), float(y)) for x, y in line]
    if len(pts) <= 2:
        return pts

    def dp(i, j, keep):
        if j <= i + 1:
            return
        dmax, imax = -1.0, None
        for k in range(i + 1, j):
            d = _perp_dist(pts[k], pts[i], pts[j])
            if d > dmax:
                dmax, imax = d, k
        if dmax > tol:
            keep.add(imax)
            dp(i, imax, keep)
            dp(imax, j, keep)

    keep = {0, len(pts) - 1}
    dp(0, len(pts) - 1, keep)
    return [pts[k] for k in sorted(keep)]


def segmentize(line, max_len: float) -> list:
    """Insert evenly spaced intermediate vertices so every segment is
    <= max_len (OGRGeometry::segmentize)."""
    pts = [(float(x), float(y)) for x, y in line]
    out = [pts[0]]
    for a, b in zip(pts[:-1], pts[1:]):
        d = math.hypot(b[0] - a[0], b[1] - a[1])
        n = max(1, int(math.ceil(d / max_len)))
        for k in range(1, n):
            t = k / n
            out.append((a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1])))
        out.append(b)
    return out


def buffer_point(x: float, y: float, radius: float, quadsegs: int = 8) -> list:
    """Closed CCW circle approximation ring (4*quadsegs vertices)."""
    n = 4 * quadsegs
    ring = [
        (x + radius * math.cos(2.0 * math.pi * k / n),
         y + radius * math.sin(2.0 * math.pi * k / n))
        for k in range(n)
    ]
    ring.append(ring[0])
    return ring


def buffer_polygon(polys, radius: float, quadsegs: int = 8) -> list:
    """Positive buffer of a (multi)polygon by Minkowski dilation.

    polys: list of polygon components, each a list of rings (outer +
    holes), each ring a closed sequence of (x, y). Returns valid
    polygons [[outer, hole, ...], ...] (same shape as
    makevalid.make_valid output).

    dilate(P, r) = P ∪ (∂P ⊕ disk_r): the boundary sweep is exactly the
    union over edges of a 2r-wide rectangle centered on the edge plus a
    full disk at every vertex (capsules). All pieces plus the original
    components go through the make-valid arrangement whose
    cross-component rule is "covered by ANY component" — overlaps
    dissolve, holes shrink by r (sharp inner corners, round outer
    corners), parts closer than 2r merge. O(n^2) segment noding: per-row
    geometry kernel, same scale posture as cascaded_union (geometry
    tables are the small side; the sweep pieces of one row never leave
    the row's task)."""
    comps = []
    for rings in polys:
        comp = []
        for ring in rings:
            pts = [(float(p[0]), float(p[1])) for p in ring]
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            if len(pts) < 3:
                continue
            comp.append(pts)
            for i in range(len(pts)):
                a, b = pts[i], pts[(i + 1) % len(pts)]
                dx, dy = b[0] - a[0], b[1] - a[1]
                ln = math.hypot(dx, dy)
                if ln > 0.0:
                    nx, ny = -dy / ln * radius, dx / ln * radius
                    comps.append([[
                        (a[0] + nx, a[1] + ny),
                        (b[0] + nx, b[1] + ny),
                        (b[0] - nx, b[1] - ny),
                        (a[0] - nx, a[1] - ny),
                    ]])
                comps.append([buffer_point(a[0], a[1], radius, quadsegs)])
        if comp:
            comps.append(comp)
    from . import makevalid as MV

    return MV.make_valid(comps)


def _segs_touch(p1, p2, p3, p4) -> bool:
    """Do closed segments p1p2 and p3p4 share at least one point?
    (proper crossing, endpoint/T-touch, collinear overlap)."""
    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    d1 = orient(p3, p4, p1)
    d2 = orient(p3, p4, p2)
    d3 = orient(p1, p2, p3)
    d4 = orient(p1, p2, p4)
    if ((d1 > 0) != (d2 > 0) or d1 == 0 or d2 == 0) and (
        (d3 > 0) != (d4 > 0) or d3 == 0 or d4 == 0
    ):
        if (d1 > 0) != (d2 > 0) and (d3 > 0) != (d4 > 0):
            return True
        if d1 == 0 and on_seg(p3, p4, p1):
            return True
        if d2 == 0 and on_seg(p3, p4, p2):
            return True
        if d3 == 0 and on_seg(p1, p2, p3):
            return True
        if d4 == 0 and on_seg(p1, p2, p4):
            return True
    return False


def boundaries_touch(polys_a, polys_b) -> bool:
    """Do the boundaries of two (multi)polygons share any point? Exact
    segment-pair test with a bbox prefilter — the BB/IB/BI leg of the
    DE-9IM Touches predicate (interior disjointness is decided separately
    from the intersection area). O(n*m) per pair: per-row geometry
    kernel, same scale posture as the other WKB kernels."""
    def segs(polys):
        out = []
        for rings in polys:
            for ring in rings:
                pts = [(float(p[0]), float(p[1])) for p in ring]
                for i in range(len(pts) - 1):
                    out.append((pts[i], pts[i + 1]))
        return out

    sa, sb = segs(polys_a), segs(polys_b)
    for a1, a2 in sa:
        axlo, axhi = min(a1[0], a2[0]), max(a1[0], a2[0])
        aylo, ayhi = min(a1[1], a2[1]), max(a1[1], a2[1])
        for b1, b2 in sb:
            if (
                max(b1[0], b2[0]) < axlo or min(b1[0], b2[0]) > axhi
                or max(b1[1], b2[1]) < aylo or min(b1[1], b2[1]) > ayhi
            ):
                continue
            if _segs_touch(a1, a2, b1, b2):
                return True
    return False
