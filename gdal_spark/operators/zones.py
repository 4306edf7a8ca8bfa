"""The `zones` table: WKB polygon join partitions (re-expresses the role of
autotest/ogr/data/poly.shp per FIXTURES.md F2) plus, for every zone, an
equivalent pure-SQL containment predicate usable as a DuckDB oracle.

Zone boundaries are chosen OFF the page-coordinate lattices (pages.py):
hotspot coords are ≡0 (mod 2000 e7-units) and uniform coords ≡0 (mod
100000); all zone bounds are ≡1000 (mod 2000) and ≢0 (mod 100000), so no
generated point can lie exactly on a zone edge and ray-cast-vs-inequality
boundary semantics can never disagree on this data. (Exact-boundary parity
itself is pinned by tests/test_kernels_pip_wkb.py against the reference
rule, ogrlinearring.cpp:498-531.)

Geometry coverage: plain rects, a triangle (non-axis-aligned edges), a
polygon with a hole, a multipolygon, a tiny sliver, a hot-cell zone (NYC
hotspot → skew), near-dateline zones, and a high-selectivity global band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.geo import TILE_SIZE
from ..kernels import wkb as W


def _rect_pred(minx, miny, maxx, maxy, lon="lon", lat="lat"):
    return (
        f"({lon} > {minx!r} AND {lon} < {maxx!r} AND {lat} > {miny!r} AND {lat} < {maxy!r})"
    )


def _tri_pred(a, b, c, lon="lon", lat="lat"):
    """CCW triangle inside test: all three edge cross-products positive."""
    def edge(p, q):
        return (
            f"(({q[0]!r} - {p[0]!r}) * ({lat} - {p[1]!r}) - "
            f"({q[1]!r} - {p[1]!r}) * ({lon} - {p[0]!r})) > 0"
        )

    return f"({edge(a, b)} AND {edge(b, c)} AND {edge(c, a)})"


def _zone_specs():
    """Returns list of (zone_id, name, wkb_bytes, oracle_pred_sql)."""
    Z = []

    def rect(zid, name, minx, miny, maxx, maxy):
        Z.append((zid, name, W.box_wkb(minx, miny, maxx, maxy), _rect_pred(minx, miny, maxx, maxy)))

    # hot zones over the five hotspots (dense-cell skew per north rule)
    rect(101, "nyc_core", -74.1001, 40.6001, -73.9001, 40.8001)
    rect(102, "london_box", -0.2201, 51.4001, 0.0199, 51.6001)
    # triangle around Tokyo hotspot (CCW)
    tri = ((139.5901, 35.5801), (139.7901, 35.5801), (139.6901, 35.7801))
    Z.append((103, "tokyo_tri", W.polygon_wkb([list(tri)]), _tri_pred(*tri)))
    # polygon with a hole around São Paulo
    outer = (-46.8001, -23.7001, -46.4001, -23.4001)
    hole = (-46.7001, -23.6001, -46.6001, -23.5001)
    Z.append(
        (
            104,
            "saopaulo_holed",
            W.polygon_wkb(
                [
                    [(outer[0], outer[1]), (outer[2], outer[1]), (outer[2], outer[3]), (outer[0], outer[3])],
                    [(hole[0], hole[1]), (hole[2], hole[1]), (hole[2], hole[3]), (hole[0], hole[3])],
                ]
            ),
            f"({_rect_pred(*outer)} AND NOT {_rect_pred(*hole)})",
        )
    )
    # multipolygon near Delhi: two disjoint rects
    ra = (77.1001, 28.5001, 77.3001, 28.7101)
    rb = (76.9001, 28.3001, 77.0501, 28.4501)
    Z.append(
        (
            105,
            "delhi_multi",
            W.multipolygon_wkb(
                [
                    [[(ra[0], ra[1]), (ra[2], ra[1]), (ra[2], ra[3]), (ra[0], ra[3])]],
                    [[(rb[0], rb[1]), (rb[2], rb[1]), (rb[2], rb[3]), (rb[0], rb[3])]],
                ]
            ),
            f"({_rect_pred(*ra)} OR {_rect_pred(*rb)})",
        )
    )
    rect(106, "mid_atlantic", -40.005, 10.005, -20.005, 30.005)
    rect(107, "nyc_sliver", -74.0001, 40.7001, -73.9961, 40.7041)
    rect(108, "dateline_east", 179.005, -20.005, 179.995, 10.005)
    rect(109, "dateline_west", -179.995, -20.005, -179.005, 10.005)
    rect(110, "equator_band", -179.995, -5.005, 179.995, 5.005)
    return Z


def zone_part_preds() -> list[tuple[int, str]]:
    """(zone_id, per-PART predicate) — one entry per polygon part (a
    multipolygon contributes one entry per member). Each part is
    4-connected when rasterized, so parts == polygonize components; this
    is the analytic ground truth for the polygonize oracle."""
    parts = []
    for zid, _, _, pred in _zone_specs():
        if zid == 105:  # multipolygon: split into its two member rects
            ra = (77.1001, 28.5001, 77.3001, 28.7101)
            rb = (76.9001, 28.3001, 77.0501, 28.4501)
            parts.append((zid, _rect_pred(*ra)))
            parts.append((zid, _rect_pred(*rb)))
        else:
            parts.append((zid, pred))
    return parts


def zones_df(spark: SparkSession) -> DataFrame:
    """Build the zones DataFrame: zone_id, name, area, geometry(WKB)."""
    rows = [
        (zid, name, float(W.shoelace_area(wkb_)), bytearray(wkb_))
        for zid, name, wkb_, _ in _zone_specs()
    ]
    schema = StructType(
        [
            StructField("zone_id", LongType(), False),
            StructField("name", StringType(), False),
            StructField("area", DoubleType(), False),
            StructField("geometry", BinaryType(), False),
        ]
    )
    from ..session import local_df

    return local_df(spark, rows, schema)


def _pixel_enum_sql(zoom: int, zid: int, wkb_: bytes, pred: str) -> str:
    """Pixel-center enumeration subquery: all (gpx, gpy, lat, lon) of the
    zone's (padded) pixel bbox whose CENTER satisfies `pred` — the
    llrasterize.cpp:41-43 center rule expressed as SQL. Bounds come from
    the mercator kernel padded by 2 (only a superset matters)."""
    import numpy as np

    from .. import oracle as OR
    from ..functions.geo import ORIGIN_SHIFT
    from ..kernels.mercator import clip_lat, latlon_to_meters, resolution
    from ..kernels.wkb import envelope

    res = resolution(zoom)
    m_total = (1 << zoom) * TILE_SIZE
    minx, miny, maxx, maxy = envelope(wkb_)
    mx, my = latlon_to_meters(clip_lat(np.array([miny, maxy])), np.array([minx, maxx]))
    gx0 = int((mx[0] + ORIGIN_SHIFT) / res) - 2
    gx1 = int((mx[1] + ORIGIN_SHIFT) / res) + 2
    gy0 = int(m_total - (my[1] + ORIGIN_SHIFT) / res) - 2
    gy1 = int(m_total - (my[0] + ORIGIN_SHIFT) / res) + 2
    lon = f"(((gpx + 0.5) * {res!r} - {ORIGIN_SHIFT!r}) / {ORIGIN_SHIFT!r} * 180.0)"
    lat_lin = (
        f"((({m_total} - gpy - 0.5) * {res!r} - {ORIGIN_SHIFT!r})"
        f" / {ORIGIN_SHIFT!r} * 180.0)"
    )
    lat = (
        f"(180.0 / {OR.PI!r} * (2.0 * ATAN(EXP({lat_lin} * {OR.PI!r} / 180.0))"
        f" - {OR.PI!r} / 2.0))"
    )
    return f"""
      (SELECT gpx, gpy FROM
        (SELECT x.range AS gpx, y.range AS gpy, {lat} AS lat, {lon} AS lon
         FROM range({gx0}, {gx1 + 1}) x, range({gy0}, {gy1 + 1}) y)
       WHERE {pred})
    """


def zones_rasterize_oracle_sql(zoom: int, zone_ids=None) -> str:
    """Independent DuckDB oracle for rasterize_zones(zoom). Pixel centers
    never fall exactly on zone edges for these fixtures, so predicate
    membership == scanline fill."""
    parts = []
    for zid, _, wkb_, pred in _zone_specs():
        if zone_ids is not None and zid not in zone_ids:
            continue
        parts.append(f"""
          SELECT CAST({zid} AS BIGINT) AS zone_id,
                 CAST({zoom} AS INTEGER) AS zoom,
                 gpx // {TILE_SIZE} AS tx, gpy // {TILE_SIZE} AS ty,
                 CAST(gpx % {TILE_SIZE} AS INTEGER) AS px,
                 CAST(gpy % {TILE_SIZE} AS INTEGER) AS py
          FROM {_pixel_enum_sql(zoom, zid, wkb_, pred)}
        """)
    return " UNION ALL ".join(parts)


def zones_polygonize_oracle_sql(zoom: int, zone_ids) -> str:
    """Oracle for polygonize(rasterize(zones)): each polygon PART is one
    4-connected component (analytic ground truth, zone_part_preds); the
    canonical component id is the part's min global pixel id."""
    world = (1 << zoom) * TILE_SIZE
    wkbs = {zid: wkb_ for zid, _, wkb_, _ in _zone_specs()}
    parts = []
    for zid, pred in zone_part_preds():
        if zid not in zone_ids:
            continue
        parts.append(f"""
          SELECT CAST({zid} AS BIGINT) AS value,
                 MIN(gpy * {world} + gpx) AS component,
                 COUNT(*) AS n_pixels
          FROM {_pixel_enum_sql(zoom, zid, wkbs[zid], pred)}
        """)
    return " UNION ALL ".join(parts)


def zones_polygonize_wkt_oracle_sql(zoom: int, zone_ids) -> str:
    """Oracle for polygonize_polygons(rasterize(zones)): every polygon
    PART of these zones rasterizes to an axis-aligned pixel rectangle
    (optionally carrying one rectangular hole — zone 104), so the
    canonical ring WKT is constructible in SQL from per-part pixel
    bounds. Vertex order mirrors the reference convention pinned in
    kernels/rings.py: outer starts at the top-left corner heading down
    (south), holes start top-left heading east."""
    world = (1 << zoom) * TILE_SIZE
    wkbs = {zid: wkb_ for zid, _, wkb_, _ in _zone_specs()}
    hole_pred = {104: _rect_pred(-46.7001, -23.6001, -46.6001, -23.5001)}
    parts = []
    for zid, pred in zone_part_preds():
        if zid not in zone_ids:
            continue
        outer_ring = (
            "concat('(', c0, ' ', r0, ',', c0, ' ', r1, ',', c1, ' ', r1, "
            "',', c1, ' ', r0, ',', c0, ' ', r0, ')')"
        )
        if zid in hole_pred:
            hole_enum = _pixel_enum_sql(zoom, zid, wkbs[zid], hole_pred[zid])
            parts.append(f"""
              SELECT CAST({zid} AS BIGINT) AS value,
                     component,
                     CAST(2 AS INTEGER) AS n_rings,
                     CAST(n_px AS DOUBLE) AS area_px,
                     concat('POLYGON (', {outer_ring}, ',',
                            '(', hc0, ' ', hr0, ',', hc1, ' ', hr0, ',',
                            hc1, ' ', hr1, ',', hc0, ' ', hr1, ',',
                            hc0, ' ', hr0, '))') AS wkt_px
              FROM (
                SELECT MIN(gpy * {world} + gpx) AS component, COUNT(*) AS n_px,
                       MIN(gpx) AS c0, MAX(gpx) + 1 AS c1,
                       MIN(gpy) AS r0, MAX(gpy) + 1 AS r1
                FROM {_pixel_enum_sql(zoom, zid, wkbs[zid], pred)}
              ), (
                SELECT MIN(gpx) AS hc0, MAX(gpx) + 1 AS hc1,
                       MIN(gpy) AS hr0, MAX(gpy) + 1 AS hr1
                FROM {hole_enum}
              )
            """)
        else:
            parts.append(f"""
              SELECT CAST({zid} AS BIGINT) AS value,
                     component,
                     CAST(1 AS INTEGER) AS n_rings,
                     CAST(n_px AS DOUBLE) AS area_px,
                     concat('POLYGON (', {outer_ring}, ')') AS wkt_px
              FROM (
                SELECT MIN(gpy * {world} + gpx) AS component, COUNT(*) AS n_px,
                       MIN(gpx) AS c0, MAX(gpx) + 1 AS c1,
                       MIN(gpy) AS r0, MAX(gpy) + 1 AS r1
                FROM {_pixel_enum_sql(zoom, zid, wkbs[zid], pred)}
              )
            """)
    return " UNION ALL ".join(parts)


def zone_rect_terms() -> dict[int, list[tuple[tuple, int]]]:
    """Axis-aligned decomposition of each zone into signed rectangles
    (outer +1, hole -1) — the analytic ground truth for rect-clip
    overlays. Triangle zone 103 excluded (not axis-aligned)."""
    outer104 = (-46.8001, -23.7001, -46.4001, -23.4001)
    hole104 = (-46.7001, -23.6001, -46.6001, -23.5001)
    ra = (77.1001, 28.5001, 77.3001, 28.7101)
    rb = (76.9001, 28.3001, 77.0501, 28.4501)
    terms = {
        101: [((-74.1001, 40.6001, -73.9001, 40.8001), 1)],
        102: [((-0.2201, 51.4001, 0.0199, 51.6001), 1)],
        104: [(outer104, 1), (hole104, -1)],
        105: [(ra, 1), (rb, 1)],
        106: [((-40.005, 10.005, -20.005, 30.005), 1)],
        107: [((-74.0001, 40.7001, -73.9961, 40.7041), 1)],
        108: [((179.005, -20.005, 179.995, 10.005), 1)],
        109: [((-179.995, -20.005, -179.005, 10.005), 1)],
        110: [((-179.995, -5.005, 179.995, 5.005), 1)],
    }
    return terms


def zones_fishnet_oracle_sql(cell: float, zone_ids) -> str:
    """Closed-form DuckDB oracle for fishnet_overlay: intersection area of
    each signed zone rectangle with each touched fishnet cell, summed per
    (zone, cell), kept where > 0."""
    parts = []
    for zid, terms in zone_rect_terms().items():
        if zid not in zone_ids:
            continue
        for (minx, miny, maxx, maxy), sign in terms:
            w = (
                f"(LEAST({maxx!r}, (fx + 1) * {cell!r}) - "
                f"GREATEST({minx!r}, fx * {cell!r}))"
            )
            h = (
                f"(LEAST({maxy!r}, (fy + 1) * {cell!r}) - "
                f"GREATEST({miny!r}, fy * {cell!r}))"
            )
            parts.append(f"""
              SELECT CAST({zid} AS BIGINT) AS zone_id, fx, fy,
                     {sign} * GREATEST({w}, 0.0) * GREATEST({h}, 0.0) AS a
              FROM (SELECT x.range AS fx, y.range AS fy
                    FROM range(CAST(FLOOR({minx!r} / {cell!r}) AS BIGINT),
                               CAST(FLOOR({maxx!r} / {cell!r}) AS BIGINT) + 1) x,
                         range(CAST(FLOOR({miny!r} / {cell!r}) AS BIGINT),
                               CAST(FLOOR({maxy!r} / {cell!r}) AS BIGINT) + 1) y)
            """)
    return f"""
      SELECT zone_id, fx, fy, ROUND(SUM(a), 9) AS area
      FROM ({" UNION ALL ".join(parts)})
      GROUP BY zone_id, fx, fy HAVING SUM(a) > 0
    """


def shifted_zones_df(spark, dx: float, dy: float, zone_ids=None):
    """The zones layer translated by (dx, dy) — the method layer for the
    zone x zone intersection oracle (a second layer with guaranteed
    interesting overlaps: self-overlaps cut through holes and multipart
    members)."""
    import pandas as pd
    from pyspark.sql import functions as F

    z = zones_df(spark).select("zone_id", "geometry")
    if zone_ids is not None:
        z = z.filter(F.col("zone_id").isin(list(zone_ids)))

    def shift(it):
        for pdf in it:
            out = []
            for buf in pdf["geometry"]:
                polys = W.decode_polygons(bytes(buf))
                moved = [
                    [ring + [dx, dy] for ring in rings] for rings in polys
                ]
                out.append(
                    W.polygon_wkb(moved[0])
                    if len(moved) == 1
                    else W.multipolygon_wkb(moved)
                )
            pdf = pdf.copy()
            pdf["geometry"] = out
            yield pdf

    return z.mapInPandas(shift, "zone_id long, geometry binary")


def zones_intersection_oracle_sql(dx: float, dy: float, zone_ids) -> str:
    """Closed-form DuckDB oracle for overlay_intersection(zones,
    shifted_zones): area(A ∩ (B + d)) by inclusion-exclusion over the
    signed-rectangle decompositions — indicator products give
    area = sum_i sum_j s_i * s_j * |r_i ∩ (r_j + d)|, exact for the
    axis-aligned zones (holes and multiparts included)."""
    terms = zone_rect_terms()
    parts = []
    for za in zone_ids:
        for zb in zone_ids:
            for (ax0, ay0, ax1, ay1), sa in terms[za]:
                for (bx0, by0, bx1, by1), sb in terms[zb]:
                    w = (
                        f"GREATEST(LEAST({ax1!r}, {bx1!r} + {dx!r}) - "
                        f"GREATEST({ax0!r}, {bx0!r} + {dx!r}), 0.0)"
                    )
                    h = (
                        f"GREATEST(LEAST({ay1!r}, {by1!r} + {dy!r}) - "
                        f"GREATEST({ay0!r}, {by0!r} + {dy!r}), 0.0)"
                    )
                    parts.append(
                        f"SELECT {za} AS za, {zb} AS zb, "
                        f"{sa * sb} * {w} * {h} AS a"
                    )
    return f"""
      SELECT CAST(za AS BIGINT) AS zone_a, CAST(zb AS BIGINT) AS zone_b,
             ROUND(SUM(a), 9) AS area
      FROM ({" UNION ALL ".join(parts)})
      GROUP BY za, zb HAVING SUM(a) > 0
    """


def zones_oracle_match_sql(page_rel: str = "pages", cols: str = "doc_id") -> str:
    """DuckDB SQL: all (page, zone_id) containment pairs as UNION ALL of
    per-zone predicate selects over `page_rel` (needs lat/lon columns)."""
    parts = [
        f"SELECT {cols}, CAST({zid} AS BIGINT) AS zone_id FROM {page_rel} "
        f"WHERE lat IS NOT NULL AND {pred}"
        for zid, _, _, pred in _zone_specs()
    ]
    return " UNION ALL ".join(parts)
