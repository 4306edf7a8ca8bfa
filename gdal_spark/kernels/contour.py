"""Marching-squares contour segments, per the reference's algorithm
(/root/reference/alg/marching_squares/square.h, alg/contour.cpp): values
live at PIXEL CENTERS (x+0.5, y+0.5); each "square" spans four adjacent
centers; a corner is HIGH when value > level; level crossings
interpolate linearly along square edges; the two ambiguous saddle cases
disambiguate by the square's center mean (the reference's fudge-free
variant). Output is the segment soup in pixel coordinates — polyline
stitching is a driver-side merge (same pattern as polygonize's
component graph).
"""

from __future__ import annotations

import numpy as np


def _interp(level, za, zb, pa, pb):
    t = (level - za) / (zb - za)
    return pa + t * (pb - pa)


def contour_segments(
    arr: np.ndarray, level: float, x_off: int = 0, y_off: int = 0
) -> np.ndarray:
    """Segments (N, 4) [x1, y1, x2, y2] in pixel coords for one level.

    NaN corners suppress their squares (halo boundaries / nodata).
    x_off/y_off: global pixel offset of arr[0,0] — applied BEFORE
    interpolation so distributed (blocked) and whole-array runs produce
    bit-identical coordinates (float addition is not associative;
    shifting after interpolation differs in the last ulp).
    """
    z = np.asarray(arr, dtype=np.float64)
    h, w = z.shape
    if h < 2 or w < 2:
        return np.empty((0, 4))
    ul = z[:-1, :-1]
    ur = z[:-1, 1:]
    ll = z[1:, :-1]
    lr = z[1:, 1:]
    valid = ~(np.isnan(ul) | np.isnan(ur) | np.isnan(ll) | np.isnan(lr))
    case = (
        (ul > level).astype(np.uint8)
        | ((ll > level).astype(np.uint8) << 1)
        | ((lr > level).astype(np.uint8) << 2)
        | ((ur > level).astype(np.uint8) << 3)
    )
    segs = []
    ys, xs = np.nonzero(valid & (case > 0) & (case < 15))
    for y, x in zip(ys, xs):
        c = case[y, x]
        zul, zur, zll, zlr = ul[y, x], ur[y, x], ll[y, x], lr[y, x]
        # corner center coords (global; int + 0.5 is exact)
        x0, y0 = (x + x_off) + 0.5, (y + y_off) + 0.5
        x1, y1 = (x + x_off) + 1.5, (y + y_off) + 1.5
        # edge crossing points (left, right, top, bottom of the square)
        def top():
            return (_interp(level, zul, zur, x0, x1), y0)

        def bottom():
            return (_interp(level, zll, zlr, x0, x1), y1)

        def left():
            return (x0, _interp(level, zul, zll, y0, y1))

        def right():
            return (x1, _interp(level, zur, zlr, y0, y1))

        # case bits: 1=UL, 2=LL, 4=LR, 8=UR (square.h flag order)
        table = {
            1: [(left, top)],
            2: [(left, bottom)],
            3: [(top, bottom)],
            4: [(bottom, right)],
            6: [(left, right)],
            7: [(top, right)],
            8: [(top, right)],
            9: [(left, right)],
            11: [(bottom, right)],
            12: [(top, bottom)],
            13: [(left, bottom)],
            14: [(left, top)],
        }
        if c in (5, 10):
            center_high = (zul + zur + zll + zlr) / 4.0 > level
            if c == 5:  # UL+LR high
                pairs = (
                    [(left, top), (bottom, right)]
                    if not center_high
                    else [(left, bottom), (top, right)]
                )
            else:  # LL+UR high
                pairs = (
                    [(left, bottom), (top, right)]
                    if not center_high
                    else [(left, top), (bottom, right)]
                )
        else:
            pairs = table[c]
        for pa, pb in pairs:
            (ax, ay), (bx2, by2) = pa(), pb()
            segs.append((ax, ay, bx2, by2))
    return np.array(segs) if segs else np.empty((0, 4))


# ---------------------------------------------------------------- polygons
#
# Iso-polygon mode (gdal_contour -p; /root/reference/alg/contour.cpp
# polygonize writer): the raster's square grid is cut into per-band
# polygonal pieces by the SAME straight chords marching squares draws
# (identical _interp crossings, identical saddle rule), so piece edges on
# shared square sides are bit-identical across squares and blocks —
# adjacent same-band pieces dissolve by exact edge-pair cancellation.
# Bands follow the writer's partition: band k = { f > levels[k-1] and
# NOT f > levels[k] } with open bands below levels[0] and above
# levels[-1] (band index = number of levels strictly below the value).

_CHORD_TABLE = {
    1: [("left", "top")],
    2: [("left", "bottom")],
    3: [("top", "bottom")],
    4: [("bottom", "right")],
    6: [("left", "right")],
    7: [("top", "right")],
    8: [("top", "right")],
    9: [("left", "right")],
    11: [("bottom", "right")],
    12: [("top", "bottom")],
    13: [("left", "bottom")],
    14: [("left", "top")],
}


def _level_chords(level, zul, zur, zll, zlr, x0, y0, x1, y1):
    """Chord segments ((pa, pb), ...) for one level on one square, with
    crossing points computed by the exact contour_segments formulas."""
    c = (
        (1 if zul > level else 0)
        | ((1 if zll > level else 0) << 1)
        | ((1 if zlr > level else 0) << 2)
        | ((1 if zur > level else 0) << 3)
    )
    if c in (0, 15):
        return []
    pts = {
        "top": (_interp(level, zul, zur, x0, x1), y0),
        "bottom": (_interp(level, zll, zlr, x0, x1), y1),
        "left": (x0, _interp(level, zul, zll, y0, y1)),
        "right": (x1, _interp(level, zur, zlr, y0, y1)),
    }
    if c in (5, 10):
        center_high = (zul + zur + zll + zlr) / 4.0 > level
        if c == 5:
            pairs = (
                [("left", "top"), ("bottom", "right")]
                if not center_high
                else [("left", "bottom"), ("top", "right")]
            )
        else:
            pairs = (
                [("left", "bottom"), ("top", "right")]
                if not center_high
                else [("left", "top"), ("bottom", "right")]
            )
    else:
        pairs = _CHORD_TABLE[c]
    return [(pts[a], pts[b]) for a, b in pairs]


def _insert_point(piece, pt):
    """Insert pt into the boundary of piece if it lies strictly inside an
    axis-aligned edge (crossing points always sit on square sides).
    Returns the (possibly new) piece; no-op if pt is already a vertex or
    on no edge."""
    if pt in piece:
        return piece
    n = len(piece)
    for i in range(n):
        (px, py), (qx, qy) = piece[i], piece[(i + 1) % n]
        if px == qx == pt[0] and min(py, qy) < pt[1] < max(py, qy):
            return piece[: i + 1] + [pt] + piece[i + 1:]
        if py == qy == pt[1] and min(px, qx) < pt[0] < max(px, qx):
            return piece[: i + 1] + [pt] + piece[i + 1:]
    return piece


def _split_piece(piece, a, b):
    """Split a convex piece along the chord a->b (both already vertices).
    Returns [piece] unchanged when the chord is not fully on this piece."""
    if a not in piece or b not in piece or a == b:
        return [piece]
    ia, ib = piece.index(a), piece.index(b)
    if ia == ib:
        return [piece]
    if ia > ib:
        ia, ib = ib, ia
    p1 = piece[ia : ib + 1]
    p2 = piece[ib:] + piece[: ia + 1]
    if len(p1) < 3 or len(p2) < 3:
        return [piece]
    return [p1, p2]


def _bilinear(zul, zur, zll, zlr, fx, fy):
    top = zul + (zur - zul) * fx
    bot = zll + (zlr - zll) * fx
    return top + (bot - top) * fy


def split_square_bands(zul, zur, zll, zlr, levels, x0, y0):
    """Cut one square (corners at centers (x0, y0)..(x0+1, y0+1)) into
    per-band pieces. Returns [(band_idx, [(x, y), ...]), ...] with pieces
    wound positively (UL->UR->LR->LL traversal).

    Chords of distinct levels on one square are assumed disjoint (exact
    for fields linear on the square; near-saddle chord crossings of two
    different levels fall back to the unsplit piece, classified by its
    centroid — the same straight-chord approximation family as the
    reference's fixed-point square cutter)."""
    x1, y1 = x0 + 1.0, y0 + 1.0
    pieces = [[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]]
    zmin = min(zul, zur, zll, zlr)
    zmax = max(zul, zur, zll, zlr)
    for level in levels:
        if not (zmin <= level <= zmax):
            continue
        for pa, pb in _level_chords(
            level, zul, zur, zll, zlr, x0, y0, x1, y1
        ):
            nxt = []
            done = False
            for piece in pieces:
                if done:
                    nxt.append(piece)
                    continue
                p2 = _insert_point(_insert_point(piece, pa), pb)
                parts = _split_piece(p2, pa, pb)
                done = len(parts) == 2
                nxt.extend(parts)
            pieces = nxt
    out = []
    for piece in pieces:
        cx = sum(p[0] for p in piece) / len(piece)
        cy = sum(p[1] for p in piece) / len(piece)
        f = _bilinear(zul, zur, zll, zlr, cx - x0, cy - y0)
        band = sum(1 for lv in levels if f > lv)
        out.append((band, piece))
    return out


def chain_rings(edges):
    """Chain directed boundary edges (each vertex in-degree == out-degree)
    into closed rings. At multi-out vertices take the leftmost turn
    relative to the incoming direction so rings stay simple. Returns
    closed vertex lists (first == last)."""
    import math as _m

    out_map = {}
    for a, b in edges:
        out_map.setdefault(a, []).append(b)
    rings = []
    while out_map:
        start = next(iter(out_map))
        nxt = out_map[start].pop()
        if not out_map[start]:
            del out_map[start]
        ring = [start, nxt]
        prev, cur = start, nxt
        while cur != start:
            outs = out_map.get(cur)
            if not outs:
                break  # open chain (should not happen on a closed region)
            if len(outs) == 1:
                chosen = outs[0]
            else:
                bin_ = _m.atan2(prev[1] - cur[1], prev[0] - cur[0])
                chosen = max(
                    outs,
                    key=lambda q: (
                        (_m.atan2(q[1] - cur[1], q[0] - cur[0]) - bin_)
                        % (2.0 * _m.pi)
                    ),
                )
            outs.remove(chosen)
            if not outs:
                del out_map[cur]
            ring.append(chosen)
            prev, cur = cur, chosen
        if cur == start:
            rings.append(ring)
    return rings
