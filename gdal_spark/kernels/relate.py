"""DE-9IM spatial predicates across mixed dimensions.

Completes the ST predicate set registered by the reference's SQL dialect
(/root/reference/ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:876-884:
ST_Intersects, ST_Equals, ST_Disjoint, ST_Touches, ST_Crosses, ST_Within,
ST_Contains, ST_Overlaps -> OGRGeometry::* -> GEOS relate) for the
geometry kinds the engine carries: Point, (Multi)LineString,
(Multi)Polygon.

From-scratch evaluation (no GEOS): instead of materializing the full
DE-9IM matrix, each type pair computes exactly the intersection flags the
eight predicates read:

  II   dim of interior∩interior (-1 empty, 0 point, 1 curve, 2 area)
  IB/BI/BB   interior-boundary / boundary-interior / boundary-boundary
  IE/BE      a's interior / boundary reaches b's exterior
  EI/EB      b's interior / boundary reaches a's exterior

Predicate definitions (OGC SFA / GEOS semantics):
  intersects = any of II, IB, BI, BB          disjoint = not intersects
  touches    = II empty and some contact      equals   = a ⊆ b and b ⊆ a
  crosses    = lines: II dim 0; dim(a)<dim(b): II and IE (and transpose)
  within     = II nonempty, not IE, not BE    contains = transpose
  overlaps   = equal dims: II of that dim, IE and EI (never for mixed)

Polygon interiors follow the engine's even-odd ring rule
(kernels/makevalid); polygon×polygon flags come from the exact
arrangement areas (boolean_op), so adjacent/coincident-boundary inputs
are handled by the same noding as the overlay operators.
"""

from __future__ import annotations

import numpy as np

from . import wkb as W
from .makevalid import boolean_op

_EPS = 1e-9


def _close(p, q):
    return abs(p[0] - q[0]) <= _EPS and abs(p[1] - q[1]) <= _EPS


def _on_segment(p, a, b):
    ax, ay = a
    bx, by = b
    px, py = p
    rx, ry = bx - ax, by - ay
    cross = rx * (py - ay) - ry * (px - ax)
    if abs(cross) > _EPS:
        return False
    dot = (px - ax) * rx + (py - ay) * ry
    rr = rx * rx + ry * ry
    return -_EPS <= dot <= rr + _EPS


def _seg_int(p1, p2, q1, q2):
    """Segment intersection: None | ('pt', (x, y)) | ('ov', (t0, t1), (x0,y0),
    (x1,y1)) with t params on p1->p2 for the overlap."""
    rx, ry = p2[0] - p1[0], p2[1] - p1[1]
    sx, sy = q2[0] - q1[0], q2[1] - q1[1]
    denom = rx * sy - ry * sx
    acx, acy = q1[0] - p1[0], q1[1] - p1[1]
    if abs(denom) > 1e-15:
        t = (acx * sy - acy * sx) / denom
        u = (acx * ry - acy * rx) / denom
        if -_EPS <= t <= 1 + _EPS and -_EPS <= u <= 1 + _EPS:
            return ("pt", (p1[0] + t * rx, p1[1] + t * ry))
        return None
    if abs(acx * ry - acy * rx) > _EPS:
        return None  # parallel, not collinear
    rr = rx * rx + ry * ry
    if rr <= 1e-30:
        return ("pt", p1) if _on_segment(p1, q1, q2) else None
    t0 = (acx * rx + acy * ry) / rr
    t1 = ((q2[0] - p1[0]) * rx + (q2[1] - p1[1]) * ry) / rr
    lo, hi = (t0, t1) if t0 <= t1 else (t1, t0)
    lo, hi = max(lo, 0.0), min(hi, 1.0)
    if hi - lo > _EPS:
        a = (p1[0] + lo * rx, p1[1] + lo * ry)
        b = (p1[0] + hi * rx, p1[1] + hi * ry)
        return ("ov", (lo, hi), a, b)
    if -_EPS <= lo <= 1 + _EPS and hi >= lo - _EPS:
        return ("pt", (p1[0] + lo * rx, p1[1] + lo * ry))
    return None


def _line_boundary(lines):
    """Mod-2 endpoint rule (OGC): a point is boundary iff it is an
    endpoint of an odd number of member curves (closed rings have no
    boundary)."""
    cnt: dict = {}
    for ln in lines:
        for p in ((float(ln[0][0]), float(ln[0][1])),
                  (float(ln[-1][0]), float(ln[-1][1]))):
            k = (round(p[0], 9), round(p[1], 9))
            cnt[k] = cnt.get(k, 0) + 1
    return {k for k, n in cnt.items() if n % 2 == 1}


def _is_boundary(p, bset):
    return (round(p[0], 9), round(p[1], 9)) in bset


def _segments(lines):
    out = []
    for li, ln in enumerate(lines):
        for i in range(len(ln) - 1):
            out.append(
                (li, i, (float(ln[i][0]), float(ln[i][1])),
                 (float(ln[i + 1][0]), float(ln[i + 1][1])))
            )
    return out


def _covered(segs, cover):
    """Every segment's [0,1] param range covered by its interval list?"""
    for key, _i, a, b in segs:
        ivs = sorted(cover.get((key, _i), []))
        pos = 0.0
        for lo, hi in ivs:
            if lo > pos + _EPS:
                return False
            pos = max(pos, hi)
        if pos < 1.0 - _EPS:
            return False
    return True


def _point_on_lines(p, segs):
    return any(_on_segment(p, a, b) for _li, _i, a, b in segs)


def _relate_LL(la, lb):
    ba, bb_ = _line_boundary(la), _line_boundary(lb)
    sa, sb = _segments(la), _segments(lb)
    f = {"II": -1, "IB": False, "BI": False, "BB": False}
    cov_a: dict = {}
    cov_b: dict = {}

    def contact(p):
        ia = not _is_boundary(p, ba)
        ib = not _is_boundary(p, bb_)
        if ia and ib:
            f["II"] = max(f["II"], 0)
        elif ia:
            f["IB"] = True
        elif ib:
            f["BI"] = True
        else:
            f["BB"] = True

    for ka, ia_, a1, a2 in sa:
        for kb, ib_, b1, b2 in sb:
            res = _seg_int(a1, a2, b1, b2)
            if res is None:
                continue
            if res[0] == "pt":
                contact(res[1])
            else:
                _t, (lo, hi), plo, phi = res
                f["II"] = 1
                cov_a.setdefault((ka, ia_), []).append((lo, hi))
                # overlap projected onto the b segment
                rr = (b2[0] - b1[0]) ** 2 + (b2[1] - b1[1]) ** 2
                u0 = ((plo[0] - b1[0]) * (b2[0] - b1[0])
                      + (plo[1] - b1[1]) * (b2[1] - b1[1])) / rr
                u1 = ((phi[0] - b1[0]) * (b2[0] - b1[0])
                      + (phi[1] - b1[1]) * (b2[1] - b1[1])) / rr
                ulo, uhi = (u0, u1) if u0 <= u1 else (u1, u0)
                cov_b.setdefault((kb, ib_), []).append(
                    (max(ulo, 0.0), min(uhi, 1.0))
                )
                contact(plo)
                contact(phi)
    sub_a = _covered(sa, cov_a)  # a ⊆ b
    sub_b = _covered(sb, cov_b)
    f["IE"] = not sub_a
    f["EI"] = not sub_b
    f["BE"] = any(not _point_on_lines(p, sb) for p in ba)
    f["EB"] = any(not _point_on_lines(p, sa) for p in bb_)
    return f


def _pip_polys(p, polys):
    """'i' strictly interior (even-odd over all rings), 'b' on a ring
    edge, 'e' exterior."""
    for rings in polys:
        for r in rings:
            for i in range(len(r) - 1):
                if _on_segment(p, (r[i][0], r[i][1]), (r[i + 1][0], r[i + 1][1])):
                    return "b"
    inside = False
    x, y = p
    for rings in polys:
        par = False
        for r in rings:
            n = len(r) - 1 if _close(r[0], r[-1]) else len(r)
            for i in range(n):
                x1, y1 = r[i % len(r)]
                x2, y2 = r[(i + 1) % len(r)]
                if (y1 > y) != (y2 > y):
                    xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                    if x < xi:
                        par = not par
        if par:
            inside = True
    return "i" if inside else "e"


def _poly_edges(polys):
    out = []
    for pi, rings in enumerate(polys):
        for ri, r in enumerate(rings):
            n = len(r)
            closed = _close(r[0], r[-1])
            m = n - 1 if closed else n
            for i in range(m):
                a = (float(r[i][0]), float(r[i][1]))
                b = (float(r[(i + 1) % n][0]), float(r[(i + 1) % n][1]))
                out.append(((pi, ri), i, a, b))
    return out


def _relate_LA(lines, polys):
    """Line a (dim 1) vs polygon b (dim 2)."""
    ba = _line_boundary(lines)
    sa = _segments(lines)
    edges = _poly_edges(polys)
    f = {"II": -1, "IB": False, "BI": False, "BB": False,
         "IE": False, "BE": False, "EI": True, "EB": True}
    for _k, _i, a1, a2 in sa:
        ts = {0.0, 1.0}
        rx, ry = a2[0] - a1[0], a2[1] - a1[1]
        rr = rx * rx + ry * ry
        for _e, _j, b1, b2 in edges:
            res = _seg_int(a1, a2, b1, b2)
            if res is None:
                continue
            if res[0] == "pt":
                f["IB"] = True if not _is_boundary(res[1], ba) else f["IB"]
                if _is_boundary(res[1], ba):
                    f["BB"] = True
                if rr > 0:
                    t = ((res[1][0] - a1[0]) * rx + (res[1][1] - a1[1]) * ry) / rr
                    ts.add(min(max(t, 0.0), 1.0))
            else:
                _t, (lo, hi), _plo, _phi = res
                ts.add(lo)
                ts.add(hi)
        tl = sorted(ts)
        for t0, t1 in zip(tl, tl[1:]):
            if t1 - t0 <= _EPS:
                continue
            tm = (t0 + t1) / 2.0
            mid = (a1[0] + tm * rx, a1[1] + tm * ry)
            loc = _pip_polys(mid, polys)
            if loc == "i":
                f["II"] = 1
            elif loc == "b":
                f["IB"] = True
            else:
                f["IE"] = True
    for p in ba:
        loc = _pip_polys(p, polys)
        if loc == "i":
            f["BI"] = True
        elif loc == "b":
            f["BB"] = True
        else:
            f["BE"] = True
    return f


def _area(polys):
    t = 0.0
    for rings in polys:
        for r in rings:
            a = 0.0
            n = len(r)
            for i in range(n - 1):
                a += r[i][0] * r[i + 1][1] - r[i + 1][0] * r[i][1]
            if not _close(r[0], r[-1]):
                a += r[-1][0] * r[0][1] - r[0][0] * r[-1][1]
            t += a / 2.0
    return abs(t)


def _relate_AA(pa, pb):
    """Polygon×polygon via the exact arrangement (boolean_op areas) plus
    boundary contact from the edge sets."""
    la = [[(float(x), float(y)) for x, y in r] for rings in pa for r in [rings[0]]]
    a_comps = [[list(map(tuple, r)) for r in rings] for rings in pa]
    b_comps = [[list(map(tuple, r)) for r in rings] for rings in pb]
    inter = _area(boolean_op(a_comps, b_comps, "intersection"))
    area_a = _area(boolean_op(a_comps, [], "union") or a_comps)
    area_b = _area(boolean_op(b_comps, [], "union") or b_comps)
    ea, eb = _poly_edges(pa), _poly_edges(pb)
    contact = False
    for _k, _i, a1, a2 in ea:
        for _e, _j, b1, b2 in eb:
            if _seg_int(a1, a2, b1, b2) is not None:
                contact = True
                break
        if contact:
            break
    f = {"II": 2 if inter > _EPS else -1}
    f["IE"] = inter < area_a - _EPS
    f["EI"] = inter < area_b - _EPS
    f["IB"] = f["BI"] = False  # areas drive the predicates below
    f["BB"] = contact
    f["BE"] = f["IE"]  # a's shell reaches b's exterior iff area remains
    f["EB"] = f["EI"]
    del la
    return f


def _predicates_from_flags(f, dim_a, dim_b):
    ii = f["II"] >= 0
    contact = ii or f["IB"] or f["BI"] or f["BB"]
    out = {
        "intersects": contact,
        "disjoint": not contact,
        "touches": (not ii) and contact,
        "within": ii and not f["IE"] and not f["BE"],
        "contains": ii and not f["EI"] and not f["EB"],
    }
    if dim_a == dim_b == 1:
        out["crosses"] = f["II"] == 0
        out["overlaps"] = f["II"] == 1 and f["IE"] and f["EI"]
    elif dim_a == dim_b:
        out["crosses"] = False
        out["overlaps"] = ii and f["IE"] and f["EI"]
    else:
        out["overlaps"] = False
        if dim_a < dim_b:
            out["crosses"] = ii and f["IE"]
        else:
            out["crosses"] = ii and f["EI"]
    out["equals"] = out["within"] and out["contains"]
    return out


def _transpose(f):
    return {
        "II": f["II"],
        "IB": f["BI"], "BI": f["IB"], "BB": f["BB"],
        "IE": f["EI"], "EI": f["IE"], "BE": f["EB"], "EB": f["BE"],
    }


def relate_wkb(buf_a: bytes, buf_b: bytes) -> dict:
    """All eight ST predicates for a pair of WKB geometries."""
    ka, kb = W.geom_kind(buf_a), W.geom_kind(buf_b)
    dims = {"P": 0, "L": 1, "A": 2}

    def flags(ka, a, kb, b):
        if ka == "L" and kb == "L":
            return _relate_LL(a, b)
        if ka == "L" and kb == "A":
            return _relate_LA(a, b)
        if ka == "A" and kb == "L":
            return _transpose(_relate_LA(b, a))
        if ka == "A" and kb == "A":
            return _relate_AA(a, b)
        if ka == "P":
            # a is an (N,2) array — a (multi)point's interior is the point
            # set itself (boundary empty), so flags OR across members.
            pts = a
            if kb == "P":
                def _in(p, arr):
                    return any(_close(p, q) for q in arr)
                shared = any(_in(p, b) for p in pts)
                a_only = any(not _in(p, b) for p in pts)
                b_only = any(not _in(q, pts) for q in b)
                return {"II": 0 if shared else -1, "IB": False, "BI": False,
                        "BB": False, "IE": a_only, "BE": False,
                        "EI": b_only, "EB": False}
            if kb == "L":
                segs = _segments(b)
                bnd = _line_boundary(b)
                ii = ib = ie = False
                for p in pts:
                    on = _point_on_lines(p, segs)
                    at_b = on and _is_boundary(p, bnd)
                    ii = ii or (on and not at_b)
                    ib = ib or at_b
                    ie = ie or (not on)
                return {"II": 0 if ii else -1,
                        "IB": ib, "BI": False, "BB": False,
                        "IE": ie, "BE": False, "EI": True, "EB": True}
            ii = ib = ie = False
            for p in pts:
                loc = _pip_polys(p, b)
                ii = ii or loc == "i"
                ib = ib or loc == "b"
                ie = ie or loc == "e"
            return {"II": 0 if ii else -1, "IB": ib,
                    "BI": False, "BB": False, "IE": ie,
                    "BE": False, "EI": True, "EB": True}
        # kb == 'P': transpose of the P-first case
        return _transpose(flags(kb, b, ka, a))

    def payload(k, buf):
        if k == "P":
            return W.decode_points(buf)
        if k == "L":
            return W.decode_linestrings(buf)
        return W.decode_polygons(buf)

    f = flags(ka, payload(ka, buf_a), kb, payload(kb, buf_b))
    return _predicates_from_flags(f, dims[ka], dims[kb])
