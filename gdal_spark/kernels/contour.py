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
