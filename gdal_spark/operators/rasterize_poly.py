"""Vector->raster: burn WKB polygons into XYZ tile pixels.

Re-expresses GDALRasterizeGeometries (/root/reference/alg/gdalrasterize.cpp:981)
over the engine's tile grid:

  1. zones side (small relative to pages/pixels): decode WKB, project
     rings to global pixel coords at `zoom` (google frame, y down),
     enumerate covering tiles from the ring bbox — a pandas_udf + explode;
  2. mapInPandas per (zone, tile): clip rings to tile-local coords, run
     the reference-exact scanline fill (kernels/rasterize.py,
     llrasterize.cpp:58 semantics: pixel center inside), emit sparse
     burned-pixel rows;
  3. MERGE_ALG (gdalrasterize.cpp:779-817): 'add' -> groupBy sum,
     'replace' -> last writer by feature order (max zone_id here),
     None -> per-feature rows (no merge).

Scale: work distributes over (zone x tile) — dense zones fan out to many
tiles, so parallelism ~ output size; the only shuffle is the optional
merge aggregation on pixel keys (uniform).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import ORIGIN_SHIFT, TILE_SIZE
from ..kernels import wkb as W
from ..kernels.mercator import clip_lat, latlon_to_meters, resolution
from ..kernels.rasterize import fill_rings_px


def _rings_to_global_px(rings, zoom: int):
    """lat/lon rings -> global google-frame pixel coords (y down)."""
    res = resolution(zoom)
    m = (1 << zoom) * TILE_SIZE
    out = []
    for ring in rings:
        lon = ring[:, 0]
        lat = clip_lat(ring[:, 1])
        mx, my = latlon_to_meters(lat, lon)
        gx = (mx + ORIGIN_SHIFT) / res
        gy = m - (my + ORIGIN_SHIFT) / res
        out.append(np.column_stack([gx, gy]))
    return out


def rasterize_zones(
    zones: DataFrame,
    zoom: int,
    merge: str | None = None,
    value_col: str = "zone_id",
) -> DataFrame:
    """Burn zone polygons into z/x/y tile pixels (google scheme).

    Returns (zone_id, zoom, tx, ty, px, py) per burned pixel for
    merge=None; for merge='add' returns (zoom, tx, ty, px, py, burn)
    summing feature values; merge='replace' keeps the max zone_id
    (last-writer by id order)."""
    n_tiles = 1 << zoom

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows_zone, rows_tx, rows_ty, rows_px, rows_py = [], [], [], [], []
            for _, row in pdf.iterrows():
                zid = row["zone_id"]
                polys = W.decode_polygons(bytes(row["geometry"]))
                for rings in polys:
                    gp = _rings_to_global_px(rings, zoom)
                    allpts = np.vstack(gp)
                    tx0 = max(int(allpts[:, 0].min()) // TILE_SIZE, 0)
                    tx1 = min(int(allpts[:, 0].max()) // TILE_SIZE, n_tiles - 1)
                    ty0 = max(int(allpts[:, 1].min()) // TILE_SIZE, 0)
                    ty1 = min(int(allpts[:, 1].max()) // TILE_SIZE, n_tiles - 1)
                    for ty in range(ty0, ty1 + 1):
                        for tx in range(tx0, tx1 + 1):
                            local = [
                                r - np.array([tx * TILE_SIZE, ty * TILE_SIZE])
                                for r in gp
                            ]
                            mask = fill_rings_px(local, TILE_SIZE, TILE_SIZE)
                            if not mask.any():
                                continue
                            yy, xx = np.nonzero(mask)
                            rows_zone.extend([zid] * len(xx))
                            rows_tx.extend([tx] * len(xx))
                            rows_ty.extend([ty] * len(xx))
                            rows_px.extend(xx.tolist())
                            rows_py.extend(yy.tolist())
            yield pd.DataFrame(
                {
                    "zone_id": pd.Series(rows_zone, dtype="int64"),
                    "zoom": pd.Series([zoom] * len(rows_zone), dtype="int32"),
                    "tx": pd.Series(rows_tx, dtype="int64"),
                    "ty": pd.Series(rows_ty, dtype="int64"),
                    "px": pd.Series(rows_px, dtype="int32"),
                    "py": pd.Series(rows_py, dtype="int32"),
                }
            )

    per_feature = zones.select("zone_id", "geometry").mapInPandas(
        gen, "zone_id long, zoom int, tx long, ty long, px int, py int"
    )
    if merge is None:
        return per_feature
    if merge == "add":
        return per_feature.groupBy("zoom", "tx", "ty", "px", "py").agg(
            F.count(F.lit(1)).alias("burn")
        )
    if merge == "replace":
        return per_feature.groupBy("zoom", "tx", "ty", "px", "py").agg(
            F.max("zone_id").alias("burn")
        )
    raise ValueError(f"unknown merge {merge}")
