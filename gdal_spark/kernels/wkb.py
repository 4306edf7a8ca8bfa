"""Minimal WKB codec: Point / LineString / Polygon / MultiPolygon, 2-D.

Re-expresses the subset of the reference's geometry factory needed by the
engine (point geotags + polygon join partitions):
/root/reference/ogr/ogrgeometry.cpp:1515 (importFromWkb), :1610 (exportToWkb)
/root/reference/ogr/ogrgeometryfactory.cpp:89 (createFromWkb dispatch)
/root/reference/ogr/ogr_core.h:409-498 (OGRwkbGeometryType codes:
  1=Point, 2=LineString, 3=Polygon, 6=MultiPolygon)

Both byte orders are accepted on import (byte 0: 0=XDR big-endian,
1=NDR little-endian, per OGC SFA); export is always NDR little-endian —
the same canonical choice the reference makes for Arrow export
(ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp "ogc.wkb" columns).

Decoded polygon representation (engine-internal):
    list of rings; each ring is an (N, 2) float64 numpy array of (x, y),
    ring[0] is the outer shell, subsequent rings are holes.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6

_BO = {0: ">", 1: "<"}


def point_wkb(x: float, y: float) -> bytes:
    """Encode a 2-D point as NDR WKB."""
    return struct.pack("<BIdd", 1, WKB_POINT, float(x), float(y))


def multipoint_wkb(pts) -> bytes:
    """Encode a multipoint (sequence of (x, y)) as NDR WKB — members are
    full point geometries, per OGRMultiPoint::exportToWkb."""
    out = [struct.pack("<BII", 1, WKB_MULTIPOINT, len(pts))]
    for x, y in pts:
        out.append(point_wkb(x, y))
    return b"".join(out)


def polygon_wkb(rings) -> bytes:
    """Encode a polygon (list of rings, each a sequence of (x, y)) as NDR WKB.

    Rings are closed automatically if first != last (reference closes rings
    in closeRings(), ogrlinearring-based ogrpolygon behavior).
    """
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        pts = [(float(x), float(y)) for x, y in ring]
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        out.append(struct.pack("<I", len(pts)))
        for x, y in pts:
            out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def multipolygon_wkb(polys) -> bytes:
    """Encode a multipolygon (list of list-of-rings) as NDR WKB."""
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(polygon_wkb(rings))
    return b"".join(out)


def linestring_wkb(pts) -> bytes:
    """Encode a 2-D linestring (sequence of (x, y)) as NDR WKB."""
    out = [struct.pack("<BII", 1, WKB_LINESTRING, len(pts))]
    for x, y in pts:
        out.append(struct.pack("<dd", float(x), float(y)))
    return b"".join(out)


def decode_linestrings(buf: bytes):
    """Decode WKB LineString or MultiLineString -> list of (N,2) arrays."""
    order, gtype, off = _read_header(buf, 0)
    if gtype == WKB_LINESTRING:
        arr, _ = _decode_ring_block(buf, off, order)
        return [arr]
    if gtype == WKB_MULTILINESTRING:
        (n,) = struct.unpack_from(order + "I", buf, off)
        off += 4
        lines = []
        for _ in range(n):
            order2, gtype2, off = _read_header(buf, off)
            if gtype2 != WKB_LINESTRING:
                raise ValueError(f"multilinestring member type {gtype2}")
            arr, off = _decode_ring_block(buf, off, order2)
            lines.append(arr)
        return lines
    raise ValueError(f"not a WKB (multi)linestring: type {gtype}")


def geom_kind(buf: bytes) -> str:
    """'P' point, 'L' (multi)linestring, 'A' (multi)polygon."""
    _, gtype, _ = _read_header(buf, 0)
    if gtype in (WKB_POINT, WKB_MULTIPOINT):
        return "P"
    if gtype in (WKB_LINESTRING, WKB_MULTILINESTRING):
        return "L"
    if gtype in (WKB_POLYGON, WKB_MULTIPOLYGON):
        return "A"
    raise ValueError(f"unsupported WKB type {gtype}")


def box_wkb(minx: float, miny: float, maxx: float, maxy: float) -> bytes:
    """Axis-aligned rectangle polygon (CCW outer ring), as NDR WKB."""
    return polygon_wkb(
        [[(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)]]
    )


def _read_header(buf: bytes, off: int):
    order = _BO[buf[off]]
    (gtype,) = struct.unpack_from(order + "I", buf, off + 1)
    # Strip 2.5D / ISO Z-M flags: reference accepts wkb25DBit and ISO codes
    # (ogr/ogr_core.h:500-510); we only handle 2-D payloads.
    gtype = gtype & 0xFF
    return order, gtype, off + 5


def decode_point(buf: bytes):
    order, gtype, off = _read_header(buf, 0)
    if gtype != WKB_POINT:
        raise ValueError(f"not a WKB point: type {gtype}")
    x, y = struct.unpack_from(order + "dd", buf, off)
    return x, y


def decode_points(buf: bytes):
    """Decode WKB Point or MultiPoint -> (N, 2) float64 array.

    MultiPoint members are full WKB point geometries (header + coords),
    per OGC SFA / OGRMultiPoint::importFromWkb."""
    order, gtype, off = _read_header(buf, 0)
    if gtype == WKB_POINT:
        x, y = struct.unpack_from(order + "dd", buf, off)
        return np.array([[x, y]], dtype=np.float64)
    if gtype == WKB_MULTIPOINT:
        (n,) = struct.unpack_from(order + "I", buf, off)
        off += 4
        pts = []
        for _ in range(n):
            order2, gtype2, off = _read_header(buf, off)
            if gtype2 != WKB_POINT:
                raise ValueError(f"multipoint member type {gtype2}")
            x, y = struct.unpack_from(order2 + "dd", buf, off)
            off += 16
            pts.append((x, y))
        return np.asarray(pts, dtype=np.float64).reshape(len(pts), 2)
    raise ValueError(f"not a WKB (multi)point: type {gtype}")


def _decode_ring_block(buf: bytes, off: int, order: str):
    (n,) = struct.unpack_from(order + "I", buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype=("<f8" if order == "<" else ">f8"), count=2 * n, offset=off)
    off += 16 * n
    return arr.astype(np.float64).reshape(n, 2), off


def _decode_polygon_body(buf: bytes, off: int, order: str):
    (nrings,) = struct.unpack_from(order + "I", buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        ring, off = _decode_ring_block(buf, off, order)
        rings.append(ring)
    return rings, off


def decode_polygons(buf: bytes):
    """Decode WKB Polygon or MultiPolygon -> list of polygons (list of rings).

    A Polygon decodes to a 1-element list. Each ring is an (N,2) float64 array.
    """
    order, gtype, off = _read_header(buf, 0)
    if gtype == WKB_POLYGON:
        rings, _ = _decode_polygon_body(buf, off, order)
        return [rings]
    if gtype == WKB_MULTIPOLYGON:
        (npoly,) = struct.unpack_from(order + "I", buf, off)
        off += 4
        polys = []
        for _ in range(npoly):
            order2, gtype2, off = _read_header(buf, off)
            if gtype2 != WKB_POLYGON:
                raise ValueError(f"multipolygon member type {gtype2}")
            rings, off = _decode_polygon_body(buf, off, order2)
            polys.append(rings)
        return polys
    raise ValueError(f"not a WKB (multi)polygon: type {gtype}")


def envelope(buf: bytes):
    """(minx, miny, maxx, maxy) of a WKB (multi)polygon — OGREnvelope::Merge
    semantics (all rings contribute, matching getEnvelope on the geometry)."""
    polys = decode_polygons(buf)
    pts = np.vstack([r for rings in polys for r in rings])
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )


def shoelace_area(buf: bytes) -> float:
    """Planar area of a WKB (multi)polygon: |shoelace| of outer rings minus
    holes — OGR_GEOM_AREA / get_Area() semantics (ogr/ogrsurface.cpp,
    ogrlinearring get_Area)."""
    total = 0.0
    for rings in decode_polygons(buf):
        for i, ring in enumerate(rings):
            x, y = ring[:, 0], ring[:, 1]
            a = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            total += a if i == 0 else -a
    return total


def centroid(buf: bytes):
    """Area-weighted centroid of a (multi)polygon WKB
    (OGRGeometry::Centroid, ogrgeometry.cpp:6108 — GEOS CG semantics:
    outer rings add, holes subtract, members accumulate by signed area).
    """
    import numpy as np

    ax = ay = aa = 0.0
    for rings in decode_polygons(buf):
        for ri, ring in enumerate(rings):
            x = np.asarray(ring[:, 0], dtype=np.float64)
            y = np.asarray(ring[:, 1], dtype=np.float64)
            if x[0] != x[-1] or y[0] != y[-1]:
                x = np.append(x, x[0])
                y = np.append(y, y[0])
            cross = x[:-1] * y[1:] - x[1:] * y[:-1]
            a = cross.sum() / 2.0
            if a == 0.0:
                continue
            cx = ((x[:-1] + x[1:]) * cross).sum() / (6.0 * a)
            cy = ((y[:-1] + y[1:]) * cross).sum() / (6.0 * a)
            sign = 1.0 if ri == 0 else -1.0
            w = sign * abs(a)
            ax += cx * w
            ay += cy * w
            aa += w
    if aa == 0.0:
        raise ValueError("zero-area geometry")
    return ax / aa, ay / aa


def wkt(buf: bytes) -> str:
    """WKB -> WKT for the supported subset (ST_AsText parity,
    ogrsqlitesqlfunctions.cpp:723)."""
    order, gtype, off = _read_header(buf, 0)
    if gtype == WKB_POINT:
        x, y = decode_point(buf)
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    polys = decode_polygons(buf)

    def ring_txt(r):
        return "(" + ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in r) + ")"

    if gtype == WKB_POLYGON:
        return "POLYGON (" + ",".join(ring_txt(r) for r in polys[0]) + ")"
    return (
        "MULTIPOLYGON ("
        + ",".join("(" + ",".join(ring_txt(r) for r in rings) + ")" for rings in polys)
        + ")"
    )


def _fmt(v: float) -> str:
    return f"{v:.15g}"
