"""Overlay / rect-clip: Sutherland-Hodgman exactness on non-axis-aligned
and holed geometries (the axis-aligned fishnet family is oracle-checked
by the driver; this covers what the SQL oracle can't)."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.kernels import clip as CL
from gdal_spark.kernels import wkb as W
from gdal_spark.operators.overlay import clip_rect, fishnet_overlay
from gdal_spark.operators.zones import zones_df

TRI = ((139.5901, 35.5801), (139.7901, 35.5801), (139.6901, 35.7801))
TRI_AREA = 0.5 * (139.7901 - 139.5901) * (35.7801 - 35.5801)


def test_clip_triangle_halfplane():
    polys = W.decode_polygons(W.polygon_wkb([list(TRI)]))
    # rect containing the whole triangle -> full area
    a_full, _ = CL.clip_polygons_rect(polys, 139.0, 35.0, 140.0, 36.0)
    assert abs(a_full - TRI_AREA) < 1e-12
    # rect covering exactly the left half (cut through the apex x)
    a_half, parts = CL.clip_polygons_rect(polys, 139.0, 35.0, 139.6901, 36.0)
    assert abs(a_half - TRI_AREA / 2) < 1e-11
    # clipped ring is a valid polygon with 3 vertices (right edge cuts
    # through apex + base midpoint)
    assert len(parts) == 1 and len(parts[0][0]) == 3 and parts[0][1] == []


def test_clip_holed_and_multi():
    outer = [(-46.8, -23.7), (-46.4, -23.7), (-46.4, -23.4), (-46.8, -23.4)]
    hole = [(-46.7, -23.6), (-46.6, -23.6), (-46.6, -23.5), (-46.7, -23.5)]
    polys = W.decode_polygons(W.polygon_wkb([outer, hole]))
    # rect covering the left half: outer half minus hole half
    a, _ = CL.clip_polygons_rect(polys, -47.0, -24.0, -46.65, -23.0)
    expect = (0.15 * 0.3) - (0.05 * 0.1)
    assert abs(a - expect) < 1e-12
    # rect fully inside the hole -> zero
    a0, parts0 = CL.clip_polygons_rect(polys, -46.69, -23.59, -46.61, -23.51)
    assert a0 == 0.0
    # the surviving left-half part keeps its hole attached to its outer
    a1, parts1 = CL.clip_polygons_rect(polys, -47.0, -24.0, -46.65, -23.0)
    assert len(parts1) == 1 and len(parts1[0][1]) == 1
    buf = CL.parts_wkb(parts1)
    assert abs(W.shoelace_area(buf) - a1) < 1e-12


def test_clip_multipart_zone_105(spark):
    """A rect spanning BOTH parts of the delhi_multi multipolygon must
    come back as a MULTIPOLYGON whose decoded area equals the area
    column (regression: rings used to flatten into one POLYGON where
    part 2's outer was read back as a hole)."""
    z = zones_df(spark).filter(F.col("zone_id") == 105)
    out = clip_rect(z, 76.0, 28.0, 78.0, 29.0).collect()  # spans both rects
    assert len(out) == 1
    buf = bytes(out[0]["wkb"])
    polys = W.decode_polygons(buf)
    assert len(polys) == 2  # two parts, not one polygon with a phantom hole
    assert abs(W.shoelace_area(buf) - out[0]["area"]) < 1e-10
    expect = (77.3001 - 77.1001) * (28.7101 - 28.5001) + (
        77.0501 - 76.9001
    ) * (28.4501 - 28.3001)
    assert abs(out[0]["area"] - expect) < 1e-12


def test_clip_rect_operator(spark):
    z = zones_df(spark).filter(F.col("zone_id") == 103)  # triangle
    out = clip_rect(z, 139.0, 35.0, 139.6901, 36.0).collect()
    assert len(out) == 1
    assert abs(out[0]["area"] - TRI_AREA / 2) < 1e-11
    # returned WKB parses and its shoelace area matches
    assert abs(W.shoelace_area(bytes(out[0]["wkb"])) - TRI_AREA / 2) < 1e-11


def test_fishnet_triangle_total_area(spark):
    """Fishnet pieces of the triangle tile it exactly: areas sum to the
    triangle area and each piece is within its cell."""
    z = zones_df(spark).filter(F.col("zone_id") == 103)
    rows = fishnet_overlay(z, 0.05, keep_wkb=True).collect()
    total = sum(r["area"] for r in rows)
    assert abs(total - TRI_AREA) < 1e-10
    for r in rows:
        minx, miny, maxx, maxy = W.envelope(bytes(r["wkb"]))
        assert minx >= r["fx"] * 0.05 - 1e-12
        assert maxx <= (r["fx"] + 1) * 0.05 + 1e-12
        assert miny >= r["fy"] * 0.05 - 1e-12
        assert maxy <= (r["fy"] + 1) * 0.05 + 1e-12
