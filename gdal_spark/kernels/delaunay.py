"""Delaunay triangulation (Bowyer-Watson) for the linear gridding family.

GDALGridLinear (/root/reference/alg/gdalgrid.cpp:2459) interpolates each
grid node barycentrically inside its Delaunay triangle (the reference
delegates to qhull). This is a from-scratch incremental Bowyer-Watson:
super-triangle, insert points one by one, re-triangulate the cavity of
circumcircle-violating triangles. O(n^2) worst case — intended for the
driver-side "small side" compile (point sets up to ~10^5), mirroring the
zone-compile pattern; the interpolation itself distributes as a
broadcast join (operators/gridding.grid_linear).
"""

from __future__ import annotations


def _circumcircle_contains(ax, ay, bx, by, cx, cy, px, py) -> bool:
    """True if (px,py) is strictly inside the circumcircle of abc
    (counter-clockwise abc; the standard in-circle determinant)."""
    adx, ady = ax - px, ay - py
    bdx, bdy = bx - px, by - py
    cdx, cdy = cx - px, cy - py
    det = (
        (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
        - (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady)
        + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
    )
    return det > 0.0


def _ccw(pts, i, j, k) -> bool:
    (x1, y1), (x2, y2), (x3, y3) = pts[i], pts[j], pts[k]
    return (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1) > 0.0


def delaunay(points) -> list:
    """points: sequence of (x, y). Returns triangles as (i, j, k) index
    triples (counter-clockwise), super-triangle removed."""
    pts = [(float(x), float(y)) for x, y in points]
    n = len(pts)
    if n < 3:
        return []
    minx = min(p[0] for p in pts)
    maxx = max(p[0] for p in pts)
    miny = min(p[1] for p in pts)
    maxy = max(p[1] for p in pts)
    span = max(maxx - minx, maxy - miny, 1e-12)
    cx0, cy0 = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    # super-triangle well outside the data
    sup = [
        (cx0 - 20.0 * span, cy0 - 10.0 * span),
        (cx0 + 20.0 * span, cy0 - 10.0 * span),
        (cx0, cy0 + 20.0 * span),
    ]
    allp = pts + sup
    si = [n, n + 1, n + 2]
    tris = [tuple(si)]

    for pi in range(n):
        px, py = allp[pi]
        bad = []
        for t in tris:
            a, b, c = t
            if not _ccw(allp, a, b, c):
                a, b, c = a, c, b
            if _circumcircle_contains(
                *allp[a], *allp[b], *allp[c], px, py
            ):
                bad.append(t)
        if not bad:
            # numerically degenerate (point on hull edge of current
            # triangulation) — find the triangle whose edge it sits on
            # via barycentric tolerance, split it
            bad = [_containing_triangle(allp, tris, px, py)]
            if bad[0] is None:
                continue
        # cavity boundary = edges belonging to exactly one bad triangle
        edge_count: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        boundary = [e for e, c in edge_count.items() if c == 1]
        tris = [t for t in tris if t not in bad]
        for (u, v) in boundary:
            if _ccw(allp, u, v, pi):
                tris.append((u, v, pi))
            else:
                tris.append((v, u, pi))

    return [
        t for t in tris if not (t[0] in si or t[1] in si or t[2] in si)
    ]


def _containing_triangle(allp, tris, px, py):
    for t in tris:
        (x1, y1), (x2, y2), (x3, y3) = allp[t[0]], allp[t[1]], allp[t[2]]
        det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
        if det == 0.0:
            continue
        l1 = ((y2 - y3) * (px - x3) + (x3 - x2) * (py - y3)) / det
        l2 = ((y3 - y1) * (px - x3) + (x1 - x3) * (py - y3)) / det
        l3 = 1.0 - l1 - l2
        if l1 >= -1e-12 and l2 >= -1e-12 and l3 >= -1e-12:
            return t
    return None
