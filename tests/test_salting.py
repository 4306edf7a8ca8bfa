"""Histogram-driven hot-cell salting: identical results, hot keys split."""

from pyspark.sql import functions as F

from gdal_spark.operators.pages import pages_from_documents
from gdal_spark.operators.pip_join import (
    hot_cell_salts,
    pip_join_broadcast,
    pip_join_bucketed,
)
from gdal_spark.operators.zones import zones_df


def test_auto_salt_preserves_results(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir, keep_internal=True).cache()
    zones = zones_df(spark)
    # tiny threshold forces the hotspot cells into the salt map
    salts = hot_cell_salts(pages, rows_per_task=10)
    assert salts, "hotspot skew should exceed a 10-row threshold"
    assert all(k >= 2 for k in salts.values())
    base = {(r["url"], r["zone_id"]) for r in pip_join_broadcast(pages, zones).collect()}
    salted = {
        (r["url"], r["zone_id"])
        for r in pip_join_bucketed(pages, zones, salt=salts).collect()
    }
    assert salted == base


def test_sampled_histogram(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir, keep_internal=True)
    full = hot_cell_salts(pages, rows_per_task=10)
    sampled = hot_cell_salts(pages, rows_per_task=10, sample=0.5)
    # sampling finds the same hot cells modulo estimation noise
    hot_full = set(full)
    hot_sampled = set(sampled)
    assert len(hot_full & hot_sampled) >= len(hot_full) // 2
