"""General polygon × polygon intersection via trapezoid decomposition.

Re-expresses OGRLayer::Intersection's pairwise feature intersection
(/root/reference/ogr/ogrlayer.cpp:3345; GEOS does the geometry there)
from scratch, built for the engine's layer-algebra overlay:

  1. the METHOD polygon (holes, concavity, multiparts all allowed)
     decomposes into horizontal-band trapezoids — split the y-range at
     every distinct vertex y, then inside each band pair the crossing
     edges left-to-right (even-odd rule). Every trapezoid is convex and
     the trapezoids partition the polygon exactly;
  2. the SUBJECT polygon (also fully general) clips against each
     trapezoid with Sutherland–Hodgman half-plane passes
     (kernels/clip.py machinery) — exact, because the clip region is
     convex;
  3. intersection area = sum of piece areas (the trapezoids are
     disjoint, so additivity is exact); geometry output = the pieces as
     a multipolygon. Pieces touching along band boundaries are NOT
     dissolved — areas and point-membership are exact, but the WKB is a
     banded partition of the intersection rather than a minimal-ring
     representation (GEOS-grade dissolve is sanctioned out of scope,
     SURVEY §2.7).
"""

from __future__ import annotations

import numpy as np

from .clip import _EMPTY, _shoelace, finish_ring


def _halfplane_edge(P: np.ndarray, ax, ay, bx, by) -> np.ndarray:
    """Keep the closed half-plane LEFT of the directed edge a->b (clip
    ring wound CCW). Vectorized like clip._halfplane, but for an
    arbitrary direction: inside-ness is the sign of the 2-D cross
    product, and the crossing point interpolates where it hits zero."""
    n = len(P)
    if n == 0:
        return P
    ex, ey = bx - ax, by - ay
    cr = ex * (P[:, 1] - ay) - ey * (P[:, 0] - ax)
    inside = cr >= 0.0
    if inside.all():
        return P
    if not inside.any():
        return _EMPTY
    prev_in = np.roll(inside, 1)
    crossing = inside != prev_in
    Pp = np.roll(P, 1, axis=0)
    crp = np.roll(cr, 1)
    ci = np.nonzero(crossing)[0]
    t = crp[ci] / (crp[ci] - cr[ci])
    ix = Pp[ci] + t[:, None] * (P[ci] - Pp[ci])
    counts = crossing.astype(np.intp) + inside.astype(np.intp)
    starts = np.cumsum(counts) - counts
    out = np.empty((int(counts.sum()), 2), dtype=np.float64)
    out[starts[ci]] = ix
    ii = np.nonzero(inside)[0]
    out[starts[ii] + crossing[ii]] = P[ii]
    return out


def _open_ring(ring) -> np.ndarray:
    P = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(P) > 1 and P[0, 0] == P[-1, 0] and P[0, 1] == P[-1, 1]:
        P = P[:-1]
    return P


def _ccw(P: np.ndarray) -> np.ndarray:
    """Orient an open ring counter-clockwise (positive signed area)."""
    x, y = P[:, 0], P[:, 1]
    s = np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)
    return P if s >= 0 else P[::-1]


def convex_clip(polys, clip_ring) -> tuple[float, list]:
    """Clip a decoded (multi)polygon against ONE convex ring. Returns
    (area, parts) with clip_polygons_rect semantics (parts grouped by
    source polygon, holes attached to their own outer)."""
    C = _ccw(_open_ring(clip_ring))
    nc = len(C)
    area = 0.0
    parts = []
    for rings in polys:
        outer = None
        holes = []
        for ri, ring in enumerate(rings):
            P = _open_ring(ring)
            for i in range(nc):
                ax, ay = C[i]
                bx, by = C[(i + 1) % nc]
                P = _halfplane_edge(P, ax, ay, bx, by)
                if len(P) == 0:
                    break
            P = finish_ring(P)
            a = _shoelace(P)
            if ri == 0:
                if a <= 0.0:
                    break
                area += a
                outer = P
            else:
                area -= a
                if a > 0.0:
                    holes.append(P)
        if outer is not None:
            parts.append((outer, holes))
    return area, parts


def trapezoid_decomp(polys) -> list[np.ndarray]:
    """Decompose a (multi)polygon (holes/concavity allowed, even-odd
    fill) into convex trapezoids: one horizontal band per gap between
    consecutive distinct vertex y's, edges crossing the band's midline
    paired left-to-right."""
    # gather all edges from all rings of all parts
    p0s, p1s = [], []
    ys = []
    for rings in polys:
        for ring in rings:
            P = _open_ring(ring)
            if len(P) < 3:
                continue
            Q = np.roll(P, -1, axis=0)
            p0s.append(P)
            p1s.append(Q)
            ys.append(P[:, 1])
    if not p0s:
        return []
    P0 = np.vstack(p0s)
    P1 = np.vstack(p1s)
    yv = np.unique(np.concatenate(ys))
    traps = []
    for y0, y1 in zip(yv[:-1], yv[1:]):
        ymid = 0.5 * (y0 + y1)
        # an edge crossing the midline spans the whole band (bands are
        # split at every vertex y); half-open test is crossing-robust
        m = (P0[:, 1] <= ymid) != (P1[:, 1] <= ymid)
        if not m.any():
            continue
        a, b = P0[m], P1[m]
        dy = b[:, 1] - a[:, 1]
        x_at = lambda y: a[:, 0] + (y - a[:, 1]) * (b[:, 0] - a[:, 0]) / dy
        x0, x1, xm = x_at(y0), x_at(y1), x_at(ymid)
        order = np.argsort(xm, kind="stable")
        x0, x1 = x0[order], x1[order]
        for i in range(0, len(order) - 1, 2):  # even-odd pairing
            lx0, lx1 = x0[i], x1[i]
            rx0, rx1 = x0[i + 1], x1[i + 1]
            quad = np.array(
                [[lx0, y0], [rx0, y0], [rx1, y1], [lx1, y1]], dtype=np.float64
            )
            if _shoelace(quad) > 0.0:
                traps.append(quad)
    return traps


def intersect_polygons(subject_polys, method_polys) -> tuple[float, list]:
    """Exact intersection of two decoded (multi)polygons. Returns
    (area, parts) — parts in clip_polygons_rect form, one banded piece
    group per (subject part x method trapezoid) with nonzero overlap."""
    area = 0.0
    parts = []
    for T in trapezoid_decomp(method_polys):
        a, p = convex_clip(subject_polys, T)
        if a > 0.0:
            area += a
            parts.extend(p)
    return area, parts
