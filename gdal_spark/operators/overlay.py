"""Layer-algebra overlay: polygons x rectangle grid (fishnet) membership,
intersection area, and clipped geometry.

Re-expresses the reference's nested-loop layer algebra
(/root/reference/ogr/ogrlayer.cpp:3345 Intersection, :5497 Clip — for
each input feature, SetSpatialFilterRect on the method layer, then exact
intersection) as the Spark two-phase plan:

  phase 1 (candidates, all JVM): zone envelopes explode to the fishnet
  cells their bbox touches — `sequence()` explode, one narrow shuffle,
  no geometry bytes in flight until the refine;
  phase 2 (exact): banded Sutherland–Hodgman rect clipping
  (kernels/clip.py) — each zone geometry decodes ONCE per batch, each
  fishnet COLUMN clips the rings once (vertical strip, shared across
  every cell row of that column), and the per-cell step is two
  vectorized numpy half-plane passes on the already-small strip; no
  per-vertex or per-pair Python arithmetic in the hot loop. Emits
  intersection area and clipped WKB (POLYGON for one surviving part,
  MULTIPOLYGON with per-part hole nesting for multipart zones);
  zero-area candidates (bbox-only touches) drop out.

At the 10^12 scale the fishnet side is the big one: the plan keys the
shuffle on fishnet cell ids, so pairs distribute by cell and each task
clips only its cells' zones (same co-location argument as the PIP
cell join).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import clip as CL
from ..kernels import wkb as W


def fishnet_overlay(
    zones: DataFrame, cell: float, keep_wkb: bool = False
) -> DataFrame:
    """(zone rows) -> (zone_id, fx, fy, area [, wkb]) for every fishnet
    cell [fx*cell, (fx+1)*cell) x [fy*cell, (fy+1)*cell) with a nonzero
    intersection area. Exact for arbitrary polygons (rect clip)."""
    from .pip_join import _zone_envelopes

    z = _zone_envelopes(zones)
    cand = (
        z.withColumn(
            "fx",
            F.explode(
                F.sequence(
                    F.floor(F.col("minx") / cell).cast("long"),
                    F.floor(F.col("maxx") / cell).cast("long"),
                )
            ),
        )
        .withColumn(
            "fy",
            F.explode(
                F.sequence(
                    F.floor(F.col("miny") / cell).cast("long"),
                    F.floor(F.col("maxy") / cell).cast("long"),
                )
            ),
        )
        .select("zone_id", "geometry", "fx", "fy")
    )

    cols = ["zone_id", "fx", "fy", "area"] + (["wkb"] if keep_wkb else [])
    out_type = (
        "zone_id long, fx long, fy long, area double, wkb binary"
        if keep_wkb
        else "zone_id long, fx long, fy long, area double"
    )

    def refine(it):
        for pdf in it:
            rows = []
            # geometry is constant per zone_id: decode once per zone,
            # strip-clip once per (zone, column), band-clip per cell
            for zid, grp in pdf.groupby("zone_id", sort=False):
                polys = W.decode_polygons(bytes(grp["geometry"].iloc[0]))
                for fx, g2 in grp.groupby("fx", sort=False):
                    band = CL.clip_polygons_band_x(
                        polys, fx * cell, (fx + 1) * cell
                    )
                    if not band:
                        continue
                    for fy in g2["fy"]:
                        area, parts = CL.clip_polygons_band_y(
                            band, fy * cell, (fy + 1) * cell
                        )
                        if area <= 0.0:
                            continue
                        row = [int(zid), int(fx), int(fy), float(area)]
                        if keep_wkb:
                            row.append(CL.parts_wkb(parts))
                        rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return cand.mapInPandas(refine, out_type)


def clip_rect(zones: DataFrame, minx, miny, maxx, maxy) -> DataFrame:
    """`gdal vector clip`-style single-rect clip: every zone clipped to
    the rect, keeping intersection area + WKB (rows with empty
    intersections drop, matching the reference's Clip output). Multipart
    results encode as MULTIPOLYGON with each hole attached to its own
    outer ring."""

    def refine(it):
        for pdf in it:
            rows = []
            for zid, geom in zip(pdf["zone_id"], pdf["geometry"]):
                polys = W.decode_polygons(bytes(geom))
                area, parts = CL.clip_polygons_rect(polys, minx, miny, maxx, maxy)
                if area <= 0.0:
                    continue
                rows.append((int(zid), float(area), CL.parts_wkb(parts)))
            yield pd.DataFrame(rows, columns=["zone_id", "area", "wkb"])

    return zones.select("zone_id", "geometry").mapInPandas(
        refine, "zone_id long, area double, wkb binary"
    )
