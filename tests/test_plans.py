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
