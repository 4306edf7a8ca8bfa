"""MakeValid: repair invalid polygons (self-intersections, self-touches,
duplicate vertices, wrong nesting) into valid (MULTI)POLYGONs.

Re-expresses OGRGeometry::MakeValid default (linework) semantics
(/root/reference/ogr/ogrgeometry.cpp MakeValid ->
GEOSMakeValid; behavior pinned by
/root/reference/autotest/ogr/ogr_geom.py:4079 test_ogr_geom_makevalid:
the bowtie POLYGON ((0 0,10 10,0 10,10 0,0 0)) becomes
MULTIPOLYGON (((0 0,5 5,10 0,0 0)),((5 5,0 10,10 10,5 5)))).

The documented rule (GEOS MakeValid linework): within one polygon
component, a point belongs to the repaired interior iff it is covered an
ODD number of times by the component's rings (even-odd); across
components of a multipolygon, the results union (a point is kept iff ANY
component keeps it). Collapsed linework (zero-area spikes, rings drawn an
even number of times) is dropped — KEEP_COLLAPSED=NO.

From-scratch implementation (no GEOS):
  1. node the linework — split every segment at every intersection with
     any other segment (proper crossings, T-touches, collinear overlaps),
     coordinates quantized to 1e-9;
  2. drop coincident duplicate sub-segments mod 2 (even multiplicity
     separates nothing under even-odd);
  3. half-edge planar subdivision: outgoing edges angularly sorted per
     vertex, next(h=(u,v)) = CCW-predecessor of reverse(h) at v —
     bounded faces trace as CCW (positive-area) cycles;
  4. keep a face iff any input component covers its representative
     interior point an odd number of times (ray-cast per ring, XOR);
  5. negative cycles become holes of the smallest kept CCW cycle
     containing their representative point; unclaimed ones bound the
     unbounded face and vanish.

Output polygons are canonicalized: outer rings CCW, holes CW, each ring
starting at its lexicographically smallest vertex.
"""

from __future__ import annotations

import bisect
import math

_Q = 9  # coordinate quantization decimals for noding


def _q(x: float, y: float):
    return (round(x, _Q), round(y, _Q))


def _seg_intersections(a, b, c, d):
    """Intersection t-parameters of segment ab with cd: returns list of
    t in (0,1) open interval where ab must be split (crossings, touches,
    collinear overlap endpoints)."""
    ax, ay = a
    bx, by = b
    cx, cy = c
    dx, dy = d
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    denom = rx * sy - ry * sx
    acx, acy = cx - ax, cy - ay
    out = []
    if abs(denom) > 1e-18:
        t = (acx * sy - acy * sx) / denom
        u = (acx * ry - acy * rx) / denom
        if -1e-12 < t < 1 + 1e-12 and -1e-12 < u < 1 + 1e-12:
            if 1e-12 < t < 1 - 1e-12:
                out.append(t)
    else:
        # parallel: collinear overlap splits ab at c and d projections
        cross = acx * ry - acy * rx
        if abs(cross) < 1e-12:
            rr = rx * rx + ry * ry
            if rr > 0:
                for px, py in ((cx, cy), (dx, dy)):
                    t = ((px - ax) * rx + (py - ay) * ry) / rr
                    if 1e-12 < t < 1 - 1e-12:
                        out.append(t)
    return out


def _ring_clean(ring):
    """Drop consecutive duplicates; ensure open ring (no repeated last)."""
    pts = [_q(float(x), float(y)) for x, y in ring]
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    out = []
    for p in pts:
        if not out or p != out[-1]:
            out.append(p)
    if len(out) > 1 and out[0] == out[-1]:
        out.pop()
    return out


def _node_segments(components):
    """components: list of ring-lists. Returns (edges, comp_rings) where
    edges is the odd-multiplicity noded undirected edge set and
    comp_rings the cleaned rings per component (for parity tests)."""
    segs = []  # (a, b)
    seg_comp = []  # component index per segment
    comp_rings = []
    for ci, rings in enumerate(components):
        cleaned = []
        for ring in rings:
            r = _ring_clean(ring)
            if len(r) >= 3:
                cleaned.append(r)
                for i in range(len(r)):
                    a, b = r[i], r[(i + 1) % len(r)]
                    segs.append((a, b))
                    seg_comp.append(ci)
        comp_rings.append(cleaned)
    # split points per segment
    cuts = [set() for _ in segs]
    for i in range(len(segs)):
        a, b = segs[i]
        for j in range(len(segs)):
            if i == j:
                continue
            c, d = segs[j]
            for t in _seg_intersections(a, b, c, d):
                cuts[i].add(t)
    # mod-2 multiplicity is a PER-COMPONENT rule (a spike drawn twice by
    # one ring separates nothing under even-odd); across components each
    # component's surviving boundary contributes once — coincident edges
    # of different components stay (the dissolve pass decides whether
    # they separate kept from kept and vanish).
    counts: dict = {}
    for (a, b), ts, ci in zip(segs, cuts, seg_comp):
        ax, ay = a
        bx, by = b
        pts = [a]
        for t in sorted(ts):
            pts.append(_q(ax + t * (bx - ax), ay + t * (by - ay)))
        pts.append(b)
        for p, q2 in zip(pts, pts[1:]):
            if p == q2:
                continue
            key = (p, q2) if p <= q2 else (q2, p)
            counts[(ci, key)] = counts.get((ci, key), 0) + 1
    edges = sorted({key for (ci, key), n in counts.items() if n % 2 == 1})
    return edges, comp_rings


def _faces(edges):
    """Half-edge face extraction. Returns list of cycles (vertex lists,
    open) with their signed areas."""
    out_edges: dict = {}
    for a, b in edges:
        out_edges.setdefault(a, []).append(b)
        out_edges.setdefault(b, []).append(a)
    order = {}
    for v, nbrs in out_edges.items():
        nbrs_sorted = sorted(
            set(nbrs), key=lambda w: math.atan2(w[1] - v[1], w[0] - v[0])
        )
        order[v] = {w: i for i, w in enumerate(nbrs_sorted)}
        out_edges[v] = nbrs_sorted
    visited = set()
    cycles = []
    for a, b in edges:
        for h in ((a, b), (b, a)):
            if h in visited:
                continue
            cyc = []
            cur = h
            while cur not in visited:
                visited.add(cur)
                cyc.append(cur[0])
                u, v = cur
                nbrs = out_edges[v]
                idx = order[v][u]
                nxt = nbrs[(idx - 1) % len(nbrs)]
                cur = (v, nxt)
            cycles.append(cyc)
    out = []
    for cyc in cycles:
        area = 0.0
        for i in range(len(cyc)):
            x1, y1 = cyc[i]
            x2, y2 = cyc[(i + 1) % len(cyc)]
            area += x1 * y2 - x2 * y1
        out.append((cyc, area / 2.0))
    return out


def _crossings(edge_list, ym):
    xs = []
    for (x1, y1), (x2, y2) in edge_list:
        if (y1 < ym) != (y2 < ym):
            xs.append(x1 + (ym - y1) * (x2 - x1) / (y2 - y1))
    return xs


def _global_ys(all_edges):
    """Sorted distinct y-values of every arrangement vertex.  Scanline
    probes must run strictly BETWEEN adjacent event rows: a ym taken
    from one cycle's own vertices alone can coincide with another
    component's horizontal edge or vertex, landing the probe point ON
    the arrangement (half-open ray-cast then misclassifies the face —
    the coincident-boundary intersection bug)."""
    ys = set()
    for (x1, y1), (x2, y2) in all_edges:
        ys.add(y1)
        ys.add(y2)
    return sorted(ys)


def _band_mid(y0, gys):
    """Midpoint of the global event band starting at y0 (strictly
    between y0 and the next distinct arrangement y); None if y0 is the
    topmost event row."""
    i = bisect.bisect_right(gys, y0)
    if i >= len(gys):
        return None
    return (y0 + gys[i]) / 2.0


def _face_point(cyc, all_edges, positive, gys):
    """A point strictly inside the FACE bounded by cycle `cyc` (not just
    inside the cycle polygon — islands of the arrangement are dodged by
    clipping to the nearest arrangement edge). Scanline through the
    global event band just above the cycle's lowest vertex (so the probe
    never lies on any arrangement edge or vertex); x1 = first crossing
    of the cycle's own edges. positive: the face lies just right of x1
    (toward the next arrangement crossing); negative: just left (toward
    the previous one) — returns None when that side is the unbounded
    face (or the band degenerates)."""
    y0 = min(p[1] for p in cyc)
    ym = _band_mid(y0, gys)
    if ym is None:
        return None
    own = [(cyc[i], cyc[(i + 1) % len(cyc)]) for i in range(len(cyc))]
    own_x = _crossings(own, ym)
    if not own_x:
        return None
    x1 = min(own_x)
    allx = _crossings(all_edges, ym)
    if positive:
        nxt = [x for x in allx if x > x1 + 1e-12]
        if not nxt:
            return None  # degenerate sliver: no face to the right
        return ((x1 + min(nxt)) / 2.0, ym)
    prev = [x for x in allx if x < x1 - 1e-12]
    if not prev:
        return None  # borders the unbounded face
    return ((max(prev) + x1) / 2.0, ym)


def _in_ring(pt, ring):
    """Even-odd crossing test, half-open rule."""
    x, y = pt
    inside = False
    n = len(ring)
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xi:
                inside = not inside
    return inside


def _covered(pt, comp_rings):
    """Any component covers pt an odd number of times?"""
    for rings in comp_rings:
        parity = False
        for r in rings:
            if _in_ring(pt, r):
                parity = not parity
        if parity:
            return True
    return False


def _canon_ring(ring, ccw: bool):
    """Drop redundant collinear vertices (noding split points landing on
    straight boundary runs), rotate to lexicographically smallest start,
    orient CCW or CW."""
    pts = list(ring)
    changed = True
    while changed and len(pts) > 3:
        changed = False
        for i in range(len(pts)):
            px, py = pts[i - 1]
            cx, cy = pts[i]
            nx, ny = pts[(i + 1) % len(pts)]
            if abs((cx - px) * (ny - py) - (cy - py) * (nx - px)) < 1e-12:
                pts.pop(i)
                changed = True
                break
    ring = pts
    area = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        area += x1 * y2 - x2 * y1
    pts = list(ring)
    if (area > 0) != ccw:
        pts.reverse()
    k = min(range(len(pts)), key=lambda i: pts[i])
    pts = pts[k:] + pts[:k]
    return pts + [pts[0]]  # closed


def _keep_per_cycle(cycles, all_edges, comp_rings, min_area, covered=None, gys=None):
    """For each cycle, is the face it bounds part of the repaired
    interior? (Unbounded face and degenerate cycles -> False.)"""
    covered = covered or _covered
    gys = gys if gys is not None else _global_ys(all_edges)
    keep = []
    for cyc, area in cycles:
        if abs(area) <= min_area:
            keep.append(False)
            continue
        pt = _face_point(cyc, all_edges, positive=area > 0, gys=gys)
        keep.append(pt is not None and covered(pt, comp_rings))
    return keep


def make_valid(components, covered=None):
    """components: list of polygon components, each a list of rings, each
    ring a sequence of (x, y). Returns a list of valid polygons
    [[outer, hole, ...], ...] with closed canonical rings; empty list if
    nothing remains (all collapsed).

    Two passes: (1) classify every face of the noded arrangement via its
    representative point, drop every edge that does NOT separate kept
    from not-kept (dissolves shared boundaries of adjacent kept faces —
    overlapping multipolygon parts union instead of emitting
    coincident-edge pieces); (2) re-extract faces of the filtered edge
    set — positive cycles are outer rings, negative ones holes of the
    smallest kept cycle containing them."""
    covered = covered or _covered
    edges, comp_rings = _node_segments(components)
    if not edges:
        return []
    min_area = 1e-12
    all_edges = edges
    gys = _global_ys(all_edges)

    cycles = _faces(edges)
    keep = _keep_per_cycle(cycles, all_edges, comp_rings, min_area, covered, gys)
    side = {}  # directed half-edge -> keep of its face
    for (cyc, _area), k in zip(cycles, keep):
        for i in range(len(cyc)):
            side[(cyc[i], cyc[(i + 1) % len(cyc)])] = k
    edges2 = [
        (a, b)
        for a, b in edges
        if side.get((a, b), False) != side.get((b, a), False)
    ]
    if not edges2:
        return []

    pos, neg = [], []
    for cyc, area in _faces(edges2):
        if area > min_area:
            pos.append((cyc, area))
        elif area < -min_area:
            neg.append((cyc, area))
    # a face can survive the edge filter with all its edges intact (every
    # neighbour kept) yet itself be exterior — re-apply the parity test
    kept = [
        (cyc, area, [])
        for (cyc, area), k in zip(
            pos, _keep_per_cycle(pos, all_edges, comp_rings, min_area, covered, gys)
        )
        if k
    ]
    kept.sort(key=lambda t: t[1])  # smallest first for hole assignment
    for cyc, _area in neg:
        # a hole's bordering face is interior (kept); the unbounded
        # face's cycle has no bordering interior and is dropped
        pt = _face_point(cyc, all_edges, positive=False, gys=gys)
        if pt is None or not covered(pt, comp_rings):
            continue
        rp = _rep_point_inside(cyc, gys)
        for owner in kept:
            if _in_ring(rp, owner[0]):
                owner[2].append(cyc)
                break
    out = []
    for cyc, _area, holes in kept:
        rings = [_canon_ring(cyc, ccw=True)]
        rings += [_canon_ring(h, ccw=False) for h in holes]
        out.append(rings)
    out.sort(key=lambda rings: rings[0][0])
    return out


def _rep_point_inside(cyc, gys=None):
    """A point inside the region ENCLOSED by cycle cyc (used only to
    find which outer ring owns a hole — the enclosed region's other
    occupants are islands, which sit inside the same owner).  Probes in
    the global event band just above the cycle's lowest vertex so the
    point never lies on another cycle's edge."""
    if gys is None:
        gys = sorted({p[1] for p in cyc})
    y0 = min(p[1] for p in cyc)
    ym = _band_mid(y0, gys)
    if ym is None:
        ym = y0
    own = [(cyc[i], cyc[(i + 1) % len(cyc)]) for i in range(len(cyc))]
    xs = sorted(_crossings(own, ym))
    return ((xs[0] + xs[1]) / 2.0, ym)


def _parity(pt, rings):
    parity = False
    for r in rings:
        if _in_ring(pt, r):
            parity = not parity
    return parity


def boolean_op(polys_a, polys_b, op: str):
    """Per-row geometric set operation between two (multi)polygons on
    the same noded arrangement (OGRGeometry::Intersection :4895, Union
    :5014, Difference :5333, SymDifference :5453 -> GEOS overlay): a
    face of the joint arrangement is kept per the boolean rule over
    "covered by any A component" / "covered by any B component"
    (even-odd within a component, matching MakeValid's rule). Returns
    valid polygons [[outer, hole, ...], ...]."""
    rules = {
        "intersection": lambda a, b: a and b,
        "union": lambda a, b: a or b,
        "difference": lambda a, b: a and not b,
        "symdifference": lambda a, b: a != b,
    }
    rule = rules[op]
    comps = [list(rings) for rings in polys_a] + [list(rings) for rings in polys_b]
    na = len(polys_a)

    def covered(pt, comp_rings):
        a = any(_parity(pt, rings) for rings in comp_rings[:na])
        b = any(_parity(pt, rings) for rings in comp_rings[na:])
        return rule(a, b)

    return make_valid(comps, covered=covered)
