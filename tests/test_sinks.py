"""MBTiles / GeoJSON sinks: write + independent read-back."""

import json
import sqlite3

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators import tiles as TI
from gdal_spark.operators.pages import pages_from_documents
from gdal_spark.operators.sinks import read_mbtiles_tile, to_geojson, write_mbtiles
from gdal_spark.operators.zones import zones_df


def test_mbtiles_roundtrip(spark, sf_dir, tmp_path):
    pages = pages_from_documents(spark, sf_dir, keep_internal=True)
    px = TI.rasterize_points(pages, 5)
    arrs = TI.tile_arrays(px)
    path = str(tmp_path / "out.mbtiles")
    n = write_mbtiles(arrs, path)
    assert n == arrs.count() and n > 0

    # independent sqlite read: schema + y-flip + payload parity
    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata").fetchall())
    assert meta["format"] == "bin"
    rows = con.execute(
        "SELECT zoom_level, tile_column, tile_row FROM tiles"
    ).fetchall()
    con.close()
    assert len(rows) == n
    for r in arrs.collect():
        z, tx, ty_g = r["zoom"], r["tx"], r["ty"]
        ty_tms = (1 << z) - 1 - ty_g
        assert (z, tx, ty_tms) in set(rows)
        back = read_mbtiles_tile(path, z, tx, ty_tms)
        assert (back == np.asarray(r["tile"], dtype=np.int64)).all()


def test_geojson_export(spark):
    z = zones_df(spark)
    doc = json.loads(to_geojson(z))
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == z.count()
    by_id = {f["id"]: f for f in doc["features"]}
    # holed polygon keeps its interior ring; multipolygon keeps 2 parts
    assert len(by_id[104]["geometry"]["coordinates"]) == 2  # outer + hole
    assert by_id[105]["geometry"]["type"] == "MultiPolygon"
    assert len(by_id[105]["geometry"]["coordinates"]) == 2
    # rings closed per RFC 7946
    ring = by_id[101]["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]
