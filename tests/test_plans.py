"""Physical-plan evidence: pushdown, pruning, no gratuitous shuffles.

The scale claims in README.md, checked against .explain output.
"""

from pyspark.sql import functions as F

from gdal_spark.functions.cells_sql import with_hex_cells
from gdal_spark.operators import tiles as TI
from gdal_spark.operators.pages import pages_from_documents
from gdal_spark.operators.pip_join import pip_join_broadcast
from gdal_spark.operators.zones import zones_df


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tile_assignment_no_shuffle(spark, sf_dir):
    """Tile assignment + pixel math is a narrow projection — zero
    exchanges end to end."""
    p = pages_from_documents(spark, sf_dir, keep_internal=True)
    d = TI.with_pixels(p.filter(F.col("lat").isNotNull()), 10)
    plan = plan_of(d)
    assert "Exchange" not in plan


def test_parquet_filter_pushdown(spark, sf_dir):
    """Base-column predicates reach the parquet scan (PushedFilters)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        (F.col("lang") == "en") & (F.col("doc_id") > 100)
    )
    plan = plan_of(docs)
    assert "PushedFilters" in plan
    assert "IsNotNull(lang)" in plan or "EqualTo(lang,en)" in plan


def test_pip_broadcast_no_pages_shuffle(spark, sf_dir):
    """Broadcast PIP join never shuffles the pages side: the only
    exchanges are broadcast exchanges of the (tiny) zones."""
    p = pages_from_documents(spark, sf_dir, keep_internal=True)
    j = pip_join_broadcast(p, zones_df(spark))
    plan = plan_of(j)
    import re

    non_broadcast_exchanges = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange\b", ln) and "Broadcast" not in ln
    ]
    assert non_broadcast_exchanges == [], non_broadcast_exchanges


def test_hex_cell_stays_jvm(spark, sf_dir):
    """Cell assignment contains no Python eval nodes (pure codegen or
    interpreted JVM projection — never Arrow/Python)."""
    p = pages_from_documents(spark, sf_dir, keep_internal=True)
    d = with_hex_cells(p.filter(F.col("lat").isNotNull()))
    plan = plan_of(d)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_single_agg_for_tile_counts(spark, sf_dir):
    """tile_counts = exactly one shuffle (partial + final hash agg)."""
    p = pages_from_documents(spark, sf_dir, keep_internal=True)
    t = TI.tile_counts(p, 7)
    plan = plan_of(t)
    assert plan.count("Exchange") <= 2  # AQE may show shuffle read+write
    assert "HashAggregate" in plan


def test_bbox_covering_pushdown(spark, sf_dir, tmp_path):
    """GeoParquet-style bbox covering pruning on the engine's own page
    layout: an indexed pages table written to parquet carries lat/lon
    (and cell) columns whose row-group min/max stats serve as the bbox
    covering; range predicates reach the scan as PushedFilters so
    out-of-bbox row groups are skipped by the reader."""
    p = pages_from_documents(spark, sf_dir, keep_internal=True).filter(
        F.col("lat").isNotNull()
    )
    path = str(tmp_path / "pages_indexed")
    p.select("url", "lat", "lon").write.mode("overwrite").parquet(path)
    q = spark.read.parquet(path).filter(
        (F.col("lat") > 10.0) & (F.col("lat") < 20.0)
        & (F.col("lon") > -5.0) & (F.col("lon") < 5.0)
    )
    plan = plan_of(q)
    assert "PushedFilters" in plan
    frags = ("GreaterThan(lat,10.0)", "LessThan(lat,20.0)",
             "GreaterThan(lon,-5.0)", "LessThan(lon,5.0)")
    # the plan's PushedFilters list truncates with "..." — require most
    # of the bbox predicates to be visibly pushed
    assert sum(f in plan for f in frags) >= 3, plan


def test_warp_single_data_exchange(spark):
    """Warp = broadcast join (need side) + ONE hash exchange into the
    per-group python stage — the src blocks are never shuffled twice."""
    import numpy as np
    import re

    from gdal_spark.operators import raster as R

    arr = np.arange(64.0 * 64.0).reshape(64, 64)
    blocks, src = R.raster_from_array(
        spark, arr, (0, 0.01, 0, 0, 0, -0.01), "EPSG:4326", block=16
    )
    dst = R.RasterMeta(64, 64, (0, 0.01, 0, 0, 0, -0.01), "EPSG:3857", block=16)
    plan = plan_of(R.warp(blocks, src, dst, "near", gather="shuffle"))
    non_broadcast = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange\b", ln) and "Broadcast" not in ln
    ]
    assert len(non_broadcast) <= 1, non_broadcast
    # broadcast gather (the small-raster auto path): ZERO exchanges —
    # a range skeleton straight into one python stage
    plan_b = plan_of(R.warp(blocks, src, dst, "near", gather="broadcast"))
    assert not re.search(r"\bExchange\b", plan_b), plan_b
