"""Concrete sink formats: MBTiles and GeoJSON.

Re-expresses the reference's tile/vector sink surface (SURVEY.md §2.1):

  * MBTiles (/root/reference/frmts/mbtiles/mbtilesdataset.cpp): a SQLite
    file with `tiles(zoom_level, tile_column, tile_row, tile_data)` in
    TMS row order plus a `metadata` key/value table. The engine's tile
    pyramid rows (google-scheme (zoom, tx, ty) + dense array) convert
    with the y-flip and write driver-side via sqlite3 — tile PAYLOAD
    assembly stays distributed (tile_arrays); only the final file write
    funnels, matching how the reference's single-file container works.
  * GeoJSON (/root/reference/ogr/ogrsf_frmts/geojson/): RFC 7946
    FeatureCollection export of WKB geometry tables.
"""

from __future__ import annotations

import json
import sqlite3

from pyspark.sql import DataFrame


def write_mbtiles(
    tiles: DataFrame,
    path: str,
    name: str = "gdal_spark",
    fmt: str = "bin",
    scheme: str = "google",
) -> int:
    """tiles: (zoom, tx, ty, tile[, checksum]) rows (tile_arrays output).
    Payload = the dense tile array serialized little-endian int64 (the
    engine's raw grid format; a PNG encoder would slot in here — note
    fmt='bin' is engine-internal, OUTSIDE the MBTiles spec enum
    png/jpg/pbf/webp, so spec-strict readers will refuse it until a real
    encoder lands). Idempotent: re-writing a tile or re-running the sink
    replaces rows instead of hitting the unique indexes.
    Returns tile count."""
    import numpy as np

    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("CREATE TABLE IF NOT EXISTS metadata (name text, value text)")
    cur.execute(
        "CREATE UNIQUE INDEX IF NOT EXISTS metadata_name ON metadata (name)"
    )
    cur.execute(
        "CREATE TABLE IF NOT EXISTS tiles (zoom_level integer, "
        "tile_column integer, tile_row integer, tile_data blob)"
    )
    cur.execute(
        "CREATE UNIQUE INDEX IF NOT EXISTS tile_index ON tiles "
        "(zoom_level, tile_column, tile_row)"
    )
    for k, v in (("name", name), ("format", fmt), ("type", "overlay")):
        cur.execute("INSERT OR REPLACE INTO metadata VALUES (?, ?)", (k, v))
    n = 0
    # toLocalIterator: one partition in driver memory at a time
    for row in tiles.toLocalIterator():
        z, tx, ty = int(row["zoom"]), int(row["tx"]), int(row["ty"])
        if scheme == "google":  # MBTiles stores TMS rows (y-flip)
            ty = (1 << z) - 1 - ty
        payload = np.asarray(row["tile"], dtype="<i8").tobytes()
        cur.execute(
            "INSERT OR REPLACE INTO tiles VALUES (?, ?, ?, ?)",
            (z, tx, ty, payload),
        )
        n += 1
    con.commit()
    con.close()
    return n


def read_mbtiles_tile(path: str, z: int, tx: int, ty_tms: int):
    """Read one tile back as an int64 numpy grid (test/consumer helper)."""
    import numpy as np

    con = sqlite3.connect(path)
    row = con.execute(
        "SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=? "
        "AND tile_row=?",
        (z, tx, ty_tms),
    ).fetchone()
    con.close()
    if row is None:
        return None
    return np.frombuffer(row[0], dtype="<i8")


def to_geojson(zones: DataFrame, id_col: str = "zone_id") -> str:
    """WKB polygon table -> RFC 7946 FeatureCollection string."""
    from ..kernels import wkb as W

    feats = []
    for r in zones.select(id_col, "geometry").toLocalIterator():
        polys = W.decode_polygons(bytes(r["geometry"]))
        if len(polys) == 1:
            geom = {
                "type": "Polygon",
                "coordinates": [[[x, y] for x, y in ring] for ring in polys[0]],
            }
        else:
            geom = {
                "type": "MultiPolygon",
                "coordinates": [
                    [[[x, y] for x, y in ring] for ring in rings] for rings in polys
                ],
            }
        feats.append(
            {
                "type": "Feature",
                "id": r[id_col],
                "properties": {id_col: r[id_col]},
                "geometry": geom,
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})
