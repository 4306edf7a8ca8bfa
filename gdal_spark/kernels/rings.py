"""Pixel-region boundary tracing: connected component -> polygon rings.

Re-expresses the OUTPUT semantics of GDAL's polygonizer (the two-arm
chains edge tracer, /root/reference/alg/polygonize_polygonizer.cpp;
driver alg/polygonize.cpp:439 GDALPolygonize) for the engine's sparse
tile-pixel model. Pinned against the reference's own autotest WKT goldens
(/root/reference/autotest/alg/polygonize.py tests 1,5,6,8 — see
tests/test_polygonize_rings.py):

  * ring vertices are pixel CORNERS; collinear vertices are collapsed
    (vertices appear only at direction changes);
  * every boundary edge is directed with the component interior on its
    LEFT (screen coords, row down): left pixel edges head south, bottom
    east, top west, right north. This makes outer rings clockwise in
    screen coords (counter-clockwise in map coords once the geotransform
    flips y) and hole rings the opposite — matching the reference WKTs;
  * at an ambiguous corner (two diagonal pixels of the SAME component, a
    checkerboard corner), the successor edge is the RIGHT turn — this
    reproduces the reference's choice of keeping diagonally-touching
    holes as two separate rings (autotest test_polygonize_5/6) and of
    merging 8-connected diagonal regions into one outer ring
    (test_polygonize_8). The rule is connectivity-independent because
    each component traces only its own edges;
  * each ring is rotated to start at its lexicographically smallest
    (row, col) corner (the reference starts rings at their top-left
    corner — verified against every golden);
  * ring order: the outer ring (negative screen shoelace) first, then
    holes sorted by their start corner (row, col).

Coordinates in = (row, col, side) boundary edges; coordinates out =
(col, row) pixel-corner rings. `rings_to_map` applies a 6-coeff
geotransform (GDALApplyGeoTransform, alg/gdaltransformer.cpp:4490).
"""

from __future__ import annotations

import numpy as np

# direction codes (screen coords: x right, y down)
E, S, W, N = 0, 1, 2, 3
_DX = (1, 0, -1, 0)
_DY = (0, 1, 0, -1)

# pixel side codes
TOP, RIGHT, BOTTOM, LEFT = 0, 1, 2, 3


def edge_of_side(r: int, c: int, side: int):
    """Directed boundary edge (start_corner_x, start_corner_y, dir) for
    `side` of pixel (row r, col c), interior-on-left orientation."""
    if side == LEFT:
        return (c, r, S)
    if side == BOTTOM:
        return (c, r + 1, E)
    if side == TOP:
        return (c + 1, r, W)
    # RIGHT
    return (c + 1, r + 1, N)


def boundary_edges(pixels):
    """All directed boundary edges of a pixel set {(r, c), ...} — reference
    helper for tests and golden generation (the distributed operator
    derives the same edges with a neighbor join)."""
    pset = set(pixels)
    edges = []
    for r, c in pset:
        if (r, c - 1) not in pset:
            edges.append(edge_of_side(r, c, LEFT))
        if (r, c + 1) not in pset:
            edges.append(edge_of_side(r, c, RIGHT))
        if (r - 1, c) not in pset:
            edges.append(edge_of_side(r, c, TOP))
        if (r + 1, c) not in pset:
            edges.append(edge_of_side(r, c, BOTTOM))
    return edges


def trace_rings(edges):
    """Assemble directed unit edges (x, y, dir) into canonical rings.

    Each directed edge has a UNIQUE successor determined purely by
    geometry: the static outgoing-direction mask at its end corner plus
    the right-turn pairing at checkerboard corners. Rings are therefore
    the cycles of a functional graph — trace each unvisited edge's cycle.

    Returns a list of rings; each ring is a list of (x, y) corner tuples,
    closed (first == last). Outer ring first, holes after, per the
    module-docstring conventions.
    """
    # static mask of ALL outgoing directions per corner (never mutated —
    # the successor function must not depend on consumption order)
    out_mask: dict = {}
    for x, y, d in edges:
        out_mask[(x, y)] = out_mask.get((x, y), 0) | (1 << d)

    def succ(x, y, d):
        cx, cy = x + _DX[d], y + _DY[d]
        avail = out_mask.get((cx, cy), 0)
        if avail == 0:
            raise ValueError(f"open boundary at corner {(cx, cy)}")
        if avail & (avail - 1) == 0:
            return cx, cy, avail.bit_length() - 1
        # checkerboard corner: the two outgoing dirs are perpendicular to
        # the incoming one; the right turn is always available
        right = (d + 1) % 4
        if not avail & (1 << right):
            raise ValueError(f"corner {(cx, cy)}: no right-turn successor")
        return cx, cy, right

    visited = set()
    rings = []
    for e0 in sorted(set(edges)):
        if e0 in visited:
            continue
        corners = []
        e = e0
        while True:
            visited.add(e)
            ne = succ(*e)
            if ne[2] != e[2]:  # direction change => turn corner
                corners.append((ne[0], ne[1]))
            if ne == e0:
                break
            e = ne
        rings.append(_canonical(corners))
    return _order_rings(rings)


def _canonical(corners):
    """Collapse collinear runs (incl. across the wrap), rotate to the
    lexicographically smallest (row, col) corner, close the ring."""
    n = len(corners)
    keep = []
    for i in range(n):
        px, py = corners[i - 1]
        cx, cy = corners[i]
        nx, ny = corners[(i + 1) % n]
        if (cx - px) * (ny - cy) != (cy - py) * (nx - cx):
            keep.append((cx, cy))
    if not keep:  # degenerate (cannot happen for unit-edge rings)
        keep = corners
    k = min(range(len(keep)), key=lambda i: (keep[i][1], keep[i][0]))
    ring = keep[k:] + keep[:k]
    ring.append(ring[0])
    return ring


def shoelace2(ring) -> float:
    """Twice the signed shoelace area (screen coords; negative = outer
    ring under interior-on-left orientation)."""
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        s += x1 * y2 - x2 * y1
    return s


def _order_rings(rings):
    outers = [r for r in rings if shoelace2(r) < 0]
    holes = [r for r in rings if shoelace2(r) >= 0]
    outers.sort(key=lambda r: (r[0][1], r[0][0]))
    holes.sort(key=lambda r: (r[0][1], r[0][0]))
    return outers + holes


def rings_to_map(rings, gt):
    """Apply a geotransform to corner rings: (c, r) -> map (x, y)
    (GDALApplyGeoTransform, alg/gdaltransformer.cpp:4490)."""
    return [
        [
            (gt[0] + c * gt[1] + r * gt[2], gt[3] + c * gt[4] + r * gt[5])
            for c, r in ring
        ]
        for ring in rings
    ]


def polygon_wkt(rings) -> str:
    """GDAL-style WKT POLYGON text for a list of closed rings."""

    def fmt(v):
        if isinstance(v, float) and v.is_integer():
            v = int(v)
        return f"{v:.15g}" if isinstance(v, float) else str(v)

    body = ",".join(
        "(" + ",".join(f"{fmt(x)} {fmt(y)}" for x, y in ring) + ")" for ring in rings
    )
    return f"POLYGON ({body})"


def region_area_px(rings) -> float:
    """Pixel area of the region: |outer| minus holes (screen shoelace)."""
    total = 0.0
    for ring in rings:
        a = shoelace2(ring) / 2.0
        total += -a  # outer negative => positive contribution
    return total
