"""Viewshed kernel: Wang-style line-sweep, reference-exact.

Reproduces /root/reference/alg/viewshed/viewshed_executor.cpp (default
options: CellMode::Edge, no curvature, no masks) bit-for-bit against the
reference's own C++ unit-test goldens (autotest/cpp/test_viewshed.cpp
`simple_height` observable-height table — see tests/test_viewshed.py):

  * heights normalize to the observer (h = dem - (dem[oy, ox] + observer_z));
  * the observer's line propagates outward with
    CalcHeightLine(d, prev) = prev * d / (d - 1) over in-place-maxed
    values (:452-460);
  * other lines process outward from the observer line; each cell's
    minimum-visible height dfZ comes from the previous line / previous
    cell per the Edge rule (:727-741, :793-807):
      - vertical (dx == 0): |dy| == 1 -> own value; else
        CalcHeightLine(|dy|, last[ox]);
      - diagonal (|dx| == |dy|): offset 1 -> own value; else
        CalcHeightLine(|dx|, lastPrev);
      - |dx| > |dy|: CalcHeightEdge(|dy|, |dx|, lastPrev, thisPrev);
      - |dx| < |dy|: CalcHeightEdge(|dx|, |dy|, lastPrev, last);
    with CalcHeightEdge(i, j, Za, Zb) = (Za*i + Zb*(j-i)) / (j-1);
  * a cell is visible iff h + target_z >= dfZ; the working value then
    becomes max(h, dfZ) (the propagating obstruction plane).

Python per-line loops — the kernel runs per OBSERVER; the engine
distributes over observers (operators/viewshed_op.py), mirroring the
reference's cumulative mode (alg/viewshed/cumulative.cpp), which is the
shape that parallelizes: the in-raster sweep is a wavefront recurrence.
"""

from __future__ import annotations

import numpy as np


def _height_line(d: int, za: float) -> float:
    return za * d / (d - 1)


def _height_edge(i: int, j: int, za: float, zb: float) -> float:
    return (za * i + zb * (j - i)) / (j - 1)


def viewshed(
    dem: np.ndarray, ox: int, oy: int,
    observer_z: float = 0.0, target_z: float = 0.0,
):
    """Returns (visible bool array, observable float array) where
    `observable` is the minimum absolute height at which each cell would
    be visible (the reference's DEM-mode value before clamping)."""
    dem = np.asarray(dem, dtype=np.float64)
    ny, nx = dem.shape
    zo = dem[oy, ox] + observer_z
    h = dem - zo
    visible = np.zeros((ny, nx), dtype=bool)
    observable = np.empty((ny, nx), dtype=np.float64)

    def set_cell(line, y, x, dfz):
        visible[y, x] = line[x] + target_z >= dfz
        observable[y, x] = dfz + zo
        line[x] = max(line[x], dfz)

    # ---- observer line
    first = h[oy].copy()
    visible[oy, ox] = True
    observable[oy, ox] = first[ox] + zo
    if ox - 1 >= 0:
        set_cell(first, oy, ox - 1, first[ox - 1])
        for x in range(ox - 2, -1, -1):
            set_cell(first, oy, x, _height_line(ox - x, first[x + 1]))
    if ox + 1 < nx:
        set_cell(first, oy, ox + 1, first[ox + 1])
        for x in range(ox + 2, nx):
            set_cell(first, oy, x, _height_line(x - ox, first[x - 1]))

    # ---- lines outward (up then down), each from the previous maxed line
    for step in (-1, 1):
        last = first.copy()
        y = oy + step
        while 0 <= y < ny:
            dy = abs(y - oy)
            this = h[y].copy()
            # vertical cell
            if dy == 1:
                set_cell(this, y, ox, this[ox])
            else:
                set_cell(this, y, ox, _height_line(dy, last[ox]))
            # left half
            for x in range(ox - 1, -1, -1):
                dx = ox - x
                if dx == dy:
                    dfz = this[x] if dx == 1 else _height_line(dx, last[x + 1])
                elif dx > dy:
                    dfz = _height_edge(dy, dx, last[x + 1], this[x + 1])
                else:
                    dfz = _height_edge(dx, dy, last[x + 1], last[x])
                set_cell(this, y, x, dfz)
            # right half
            for x in range(ox + 1, nx):
                dx = x - ox
                if dx == dy:
                    dfz = this[x] if dx == 1 else _height_line(dx, last[x - 1])
                elif dx > dy:
                    dfz = _height_edge(dy, dx, last[x - 1], this[x - 1])
                else:
                    dfz = _height_edge(dx, dy, last[x - 1], last[x])
                set_cell(this, y, x, dfz)
            last = this
            y += step

    return visible, observable
