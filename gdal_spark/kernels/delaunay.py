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


def delaunay_np(xs, ys):
    """Vectorized Bowyer-Watson: same triangulation as `delaunay` (the
    Delaunay triangulation is unique for points in general position) but
    the per-insertion cavity search is one numpy in-circle test over all
    live triangles instead of a Python loop — fast enough for the
    per-tile triangulations of the distributed grid_linear path
    (~10^3-10^4 points per tile in well under a second).

    xs, ys: float64 arrays (coincident points must be deduplicated by
    the caller). Returns (tri, ccx, ccy, cr2): (T,3) int32 vertex-index
    triples plus each triangle's circumcenter and squared circumradius
    (the tile-certainty test needs the circumdisk).
    """
    import numpy as np

    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = xs.size
    empty = (
        np.empty((0, 3), np.int32),
        np.empty(0),
        np.empty(0),
        np.empty(0),
    )
    if n < 3:
        return empty
    minx, maxx = float(xs.min()), float(xs.max())
    miny, maxy = float(ys.min()), float(ys.max())
    span = max(maxx - minx, maxy - miny, 1e-12)
    cx0, cy0 = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    # super-triangle matching `delaunay` so hull-adjacent tie behavior
    # (which super vertex "sees" a hull edge) is shared
    allx = np.concatenate(
        [xs, [cx0 - 20.0 * span, cx0 + 20.0 * span, cx0]]
    )
    ally = np.concatenate(
        [ys, [cy0 - 10.0 * span, cy0 - 10.0 * span, cy0 + 20.0 * span]]
    )

    cap = max(64, 4 * n)
    tv = np.empty((cap, 3), np.int64)
    ccx = np.empty(cap)
    ccy = np.empty(cap)
    cr2 = np.empty(cap)
    alive = np.zeros(cap, bool)

    def circum(ia, ib, ic):
        """Circumcenter/r^2 via the a-relative stable form; degenerate
        (collinear) triangles get an infinite circumdisk so the next
        inserted point removes them."""
        ax, ay = allx[ia], ally[ia]
        bx, by = allx[ib] - ax, ally[ib] - ay
        cx, cy = allx[ic] - ax, ally[ic] - ay
        d = 2.0 * (bx * cy - by * cx)
        b2 = bx * bx + by * by
        c2 = cx * cx + cy * cy
        with np.errstate(divide="ignore", invalid="ignore"):
            ux = (cy * b2 - by * c2) / d
            uy = (bx * c2 - cx * b2) / d
        r2 = ux * ux + uy * uy
        bad = ~np.isfinite(r2)
        ux = np.where(bad, 0.0, ux)
        uy = np.where(bad, 0.0, uy)
        r2 = np.where(bad, np.inf, r2)
        return ax + ux, ay + uy, r2

    top = 1
    tv[0] = (n, n + 1, n + 2)
    a0, b0, c0 = circum(
        np.array([n]), np.array([n + 1]), np.array([n + 2])
    )
    ccx[0], ccy[0], cr2[0] = a0[0], b0[0], c0[0]
    alive[0] = True

    for pi in range(n):
        px, py = allx[pi], ally[pi]
        dx = px - ccx[:top]
        dy = py - ccy[:top]
        bad = alive[:top] & (dx * dx + dy * dy < cr2[:top])
        bad_idx = np.nonzero(bad)[0]
        if bad_idx.size == 0:
            # numerically degenerate: point exactly on an edge — split
            # the containing triangle (same fallback as `delaunay`)
            det_x3 = allx[tv[:top, 2]]
            det_y3 = ally[tv[:top, 2]]
            det = (ally[tv[:top, 1]] - det_y3) * (
                allx[tv[:top, 0]] - det_x3
            ) + (det_x3 - allx[tv[:top, 1]]) * (ally[tv[:top, 0]] - det_y3)
            with np.errstate(divide="ignore", invalid="ignore"):
                l1 = (
                    (ally[tv[:top, 1]] - det_y3) * (px - det_x3)
                    + (det_x3 - allx[tv[:top, 1]]) * (py - det_y3)
                ) / det
                l2 = (
                    (det_y3 - ally[tv[:top, 0]]) * (px - det_x3)
                    + (allx[tv[:top, 0]] - det_x3) * (py - det_y3)
                ) / det
            l3 = 1.0 - l1 - l2
            cont = (
                alive[:top]
                & (det != 0.0)
                & (l1 >= -1e-12)
                & (l2 >= -1e-12)
                & (l3 >= -1e-12)
            )
            ci = np.nonzero(cont)[0]
            if ci.size == 0:
                continue
            bad_idx = ci[:1]
        # cavity boundary: edges used by exactly one bad triangle
        edge_count: dict = {}
        for t in bad_idx:
            v0, v1, v2 = tv[t]
            for e in ((v0, v1), (v1, v2), (v2, v0)):
                key = (e[0], e[1]) if e[0] < e[1] else (e[1], e[0])
                edge_count[key] = edge_count.get(key, 0) + 1
        boundary = [e for e, c in edge_count.items() if c == 1]
        alive[bad_idx] = False
        k = len(boundary)
        if top + k > cap:
            newcap = max(cap * 2, top + k)
            tv = np.resize(tv, (newcap, 3))
            ccx = np.resize(ccx, newcap)
            ccy = np.resize(ccy, newcap)
            cr2 = np.resize(cr2, newcap)
            a2 = np.zeros(newcap, bool)
            a2[:cap] = alive
            alive = a2
            cap = newcap
        eu = np.fromiter((e[0] for e in boundary), np.int64, k)
        ev = np.fromiter((e[1] for e in boundary), np.int64, k)
        sl = slice(top, top + k)
        tv[sl, 0] = eu
        tv[sl, 1] = ev
        tv[sl, 2] = pi
        ccx[sl], ccy[sl], cr2[sl] = circum(eu, ev, np.full(k, pi))
        alive[sl] = True
        top += k
        # compact when mostly dead (keeps the vectorized scan O(live))
        if top > 4096 and alive[:top].sum() * 2 < top:
            live = np.nonzero(alive[:top])[0]
            m = live.size
            tv[:m] = tv[live]
            ccx[:m] = ccx[live]
            ccy[:m] = ccy[live]
            cr2[:m] = cr2[live]
            alive[:top] = False
            alive[:m] = True
            top = m

    live = np.nonzero(alive[:top])[0]
    keep = live[(tv[live] < n).all(axis=1) & np.isfinite(cr2[live])]
    return (
        tv[keep].astype(np.int32),
        ccx[keep].copy(),
        ccy[keep].copy(),
        cr2[keep].copy(),
    )
