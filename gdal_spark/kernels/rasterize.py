"""Scanline polygon fill, reference-exact.

Reproduces GDALdllImageFilledPolygon (/root/reference/alg/llrasterize.cpp:58)
in numpy, in PIXEL coordinates (callers transform geometry to the target
pixel grid first):

  * a pixel is burned iff its CENTER falls inside the polygon
    (llrasterize.cpp:41-43 rule);
  * scanline centers dy = y + 0.5; per edge ordered so dy1 < dy2, a
    crossing exists when dy1 <= dy < dy2 at
    x = floor((dy-dy1)(dx2-dx1)/(dy2-dy1) + dx1 + 0.5)  (:109 rounding);
  * crossings from ALL parts (outer rings + holes + multipolygon members)
    sort into one list per scanline; fill [c[2i], c[2i+1]-1] (odd-even);
  * bottom horizontal edges (x_prev > x_next) fill separately
    [floor(x2+0.5), floor(x1+0.5)-1]; top horizontals skip (:163-193).
"""

from __future__ import annotations

import numpy as np


def fill_rings_px(rings, width: int, height: int) -> np.ndarray:
    """Burn mask (height, width) bool from rings in pixel coords.

    rings: list of (N,2) float arrays (closed or open; the closing edge is
    implied like the reference's part handling). All rings participate in
    one odd-even crossing list (holes un-fill automatically).
    """
    mask = np.zeros((height, width), dtype=bool)
    ys = [r[:, 1] for r in rings if len(r) >= 3]
    if not ys:
        return mask
    dminy = min(float(y.min()) for y in ys)
    dmaxy = max(float(y.max()) for y in ys)
    miny = max(int(dminy), 0)
    maxy = min(int(dmaxy), height - 1)
    if maxy < miny:
        return mask
    n_scan = maxy - miny + 1
    dy = np.arange(miny, maxy + 1, dtype=np.float64) + 0.5

    crossings: list[list[np.ndarray]] = [[] for _ in range(n_scan)]
    horiz: list[list[tuple[int, int]]] = [[] for _ in range(n_scan)]

    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) >= 2 and (r[0] == r[-1]).all():
            r = r[:-1]  # open the ring; closing edge added below
        if len(r) < 3:
            continue
        x1s = r[:, 0]
        y1s = r[:, 1]
        x2s = np.roll(x1s, 1)  # previous vertex (the reference's ind1)
        y2s = np.roll(y1s, 1)
        for ex1, ey1, ex2, ey2 in zip(x2s, y2s, x1s, y1s):
            # (ex1,ey1)=ind1 (prev), (ex2,ey2)=ind2 (current)
            if ey1 == ey2:
                # horizontal: bottom (x_ind1 > x_ind2) fills separately
                if ex1 > ex2:
                    sel = dy == ey1  # only the scanline at exactly this y
                    idx = np.nonzero(sel)[0]
                    hx1 = int(np.floor(ex2 + 0.5))
                    hx2 = int(np.floor(ex1 + 0.5))
                    for i in idx:
                        horiz[i].append((hx1, hx2))
                continue
            if ey1 < ey2:
                dy1, dy2, dx1, dx2 = ey1, ey2, ex1, ex2
            else:
                dy1, dy2, dx1, dx2 = ey2, ey1, ex2, ex1
            sel = (dy >= dy1) & (dy < dy2)
            if not sel.any():
                continue
            inter = (dy[sel] - dy1) * (dx2 - dx1) / (dy2 - dy1) + dx1
            cx = np.floor(inter + 0.5).astype(np.int64)
            for i, c in zip(np.nonzero(sel)[0], cx):
                crossings[i].append(c)

    maxx = width - 1
    for i in range(n_scan):
        y = miny + i
        cs = np.sort(np.asarray(crossings[i], dtype=np.int64))
        for j in range(0, len(cs) - 1, 2):
            a, b = int(cs[j]), int(cs[j + 1]) - 1
            if a <= maxx and b >= 0:
                mask[y, max(a, 0) : min(b, maxx) + 1] = True
        for hx1, hx2 in sorted(horiz[i]):
            a, b = hx1, hx2 - 1
            if a <= maxx and b >= 0:
                mask[y, max(a, 0) : min(b, maxx) + 1] = True
    return mask
