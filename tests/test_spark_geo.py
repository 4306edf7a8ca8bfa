"""End-to-end Spark tests: pages generation parity with the DuckDB CTE,
extractor invariants, cell assignment SQL-vs-kernel, and the PIP join
(broadcast vs bucketed vs brute-force numpy oracle)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from gdal_spark.functions.cells_sql import hex_cell
from gdal_spark.kernels import hexcell as HX
from gdal_spark.kernels import pip as PIP
from gdal_spark.operators import pages as P
from gdal_spark.operators import zones as Z
from gdal_spark.operators.pip_join import pip_join_broadcast, pip_join_bucketed


@pytest.fixture(scope="module")
def pages_pdf(spark, sf_dir):
    return (
        P.pages_from_documents(spark, sf_dir, keep_internal=True)
        .orderBy("doc_id")
        .toPandas()
    )


def test_pages_parity_with_duckdb_cte(spark, sf_dir, pages_pdf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(
        f"WITH pages AS ({P.pages_cte_sql()}) SELECT doc_id, url, warc_ts, lat_e7, lon_e7, lat, lon FROM pages ORDER BY doc_id"
    ).fetchdf()
    got = pages_pdf[["doc_id", "url", "warc_ts", "lat_e7", "lon_e7", "lat", "lon"]]
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["url"].reset_index(drop=True), want["url"], check_names=False
    )
    for c in ("lat_e7", "lon_e7"):
        np.testing.assert_array_equal(
            got[c].to_numpy(dtype=np.float64), want[c].to_numpy(dtype=np.float64)
        )
    for c in ("lat", "lon"):
        # identical doubles, bit-exact
        g = got[c].to_numpy(dtype=np.float64)
        w = want[c].to_numpy(dtype=np.float64)
        mask = ~np.isnan(g)
        np.testing.assert_array_equal(g[mask], w[mask])
        assert (np.isnan(w) == ~mask).all()
    np.testing.assert_array_equal(
        got["warc_ts"].to_numpy(), want["warc_ts"].to_numpy()
    )


def test_extract_text_byte_identical(spark, sf_dir):
    df = P.pages_from_documents(spark, sf_dir)
    bad = df.filter(P.extract_text_expr("html") != df.text).count()
    assert bad == 0


def test_extract_geo_roundtrip(spark, sf_dir):
    df = P.pages_from_documents(spark, sf_dir, keep_internal=True)
    re_ex = P.extract_geo(
        df.select("doc_id", "html", df.lat_e7.alias("gen_lat_e7"), df.lon_e7.alias("gen_lon_e7"))
    )
    bad = re_ex.filter(
        ~(
            (re_ex.lat_e7.eqNullSafe(re_ex.gen_lat_e7))
            & (re_ex.lon_e7.eqNullSafe(re_ex.gen_lon_e7))
        )
    ).count()
    assert bad == 0


def test_geo_distribution(pages_pdf):
    has_geo = pages_pdf["lat_e7"].notna().mean()
    assert 0.8 < has_geo <= 0.95


@pytest.mark.parametrize("res", [7, 9])
def test_hex_cell_sql_matches_kernel(spark, sf_dir, pages_pdf, res):
    import pyspark.sql.functions as F

    df = P.pages_from_documents(spark, sf_dir, keep_internal=True).filter(
        "lat IS NOT NULL"
    )
    got = (
        df.select("doc_id", hex_cell(F.col("lat"), F.col("lon"), res).alias("cell"))
        .orderBy("doc_id")
        .toPandas()
    )
    sub = pages_pdf[pages_pdf["lat_e7"].notna()].sort_values("doc_id")
    want = HX.latlon_to_cell(
        sub["lat"].to_numpy(np.float64), sub["lon"].to_numpy(np.float64), res
    )
    np.testing.assert_array_equal(got["cell"].to_numpy(np.int64), want)


def _oracle_pairs(pages_pdf):
    """Brute-force numpy ray-cast over every (page, zone)."""
    sub = pages_pdf[pages_pdf["lat_e7"].notna()]
    lon = sub["lon"].to_numpy(np.float64)
    lat = sub["lat"].to_numpy(np.float64)
    ids = sub["doc_id"].to_numpy(np.int64)
    pairs = set()
    for zid, name, wkb_, pred in Z._zone_specs():
        hit = PIP.points_in_wkb(lon, lat, wkb_)
        for d in ids[hit]:
            pairs.add((int(d), zid))
    return pairs


def test_pip_join_broadcast_matches_oracle(spark, sf_dir, pages_pdf):
    pages = P.pages_from_documents(spark, sf_dir, keep_internal=True)
    zones = Z.zones_df(spark)
    got = {
        (r["doc_id"], r["zone_id"])
        for r in pip_join_broadcast(pages, zones).select("doc_id", "zone_id").collect()
    }
    assert got == _oracle_pairs(pages_pdf)


def test_pip_join_bucketed_matches_broadcast(spark, sf_dir, pages_pdf):
    pages = P.pages_from_documents(spark, sf_dir, keep_internal=True)
    zones = Z.zones_df(spark)
    want = _oracle_pairs(pages_pdf)
    for res, salt in [(7, 0), (8, 4)]:
        got = {
            (r["doc_id"], r["zone_id"])
            for r in pip_join_bucketed(pages, zones, res=res, salt=salt)
            .select("doc_id", "zone_id")
            .collect()
        }
        assert got == want, f"res={res} salt={salt}"


def test_pip_oracle_sql_predicates_match_raycast(sf_dir, pages_pdf):
    """The per-zone SQL predicates (DuckDB oracle) agree with ray-cast."""
    con = duckdb.connect()
    con.register("pages", pages_pdf)
    got = set(
        map(tuple, con.execute(Z.zones_oracle_match_sql()).fetchall())
    )
    assert got == _oracle_pairs(pages_pdf)
