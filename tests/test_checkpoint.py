"""Kill-resume checkpointing: per-partition lineage, no recompute."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.pages import pages_from_documents
from gdal_spark.operators.pip_join import pip_join_broadcast
from gdal_spark.operators.zones import zones_df
from gdal_spark.plans.checkpoint import CheckpointStore


@pytest.fixture()
def store(tmp_path):
    return CheckpointStore(str(tmp_path / "ckpt"))


def _transform(zones):
    def t(df):
        return pip_join_broadcast(df, zones).select("part_id", "url", "zone_id")

    return t


def test_kill_then_resume_no_recompute(spark, sf_dir, store):
    pages = pages_from_documents(spark, sf_dir, keep_internal=True)
    zones = zones_df(spark)
    expected = {
        (r["url"], r["zone_id"]) for r in pip_join_broadcast(pages, zones).collect()
    }

    # first run dies after 2 of 4 batches
    with pytest.raises(RuntimeError, match="injected failure"):
        store.run_stage(
            spark, "pip", pages, _transform(zones), lineage_key="url",
            n_parts=8, n_batches=4, fail_after_batches=2,
        )
    partial = store.completed_parts(spark, "pip")
    assert 0 < len(partial) < 8

    # resume completes only the missing parts
    out = store.run_stage(
        spark, "pip", pages, _transform(zones), lineage_key="url",
        n_parts=8, n_batches=4,
    )
    got = {(r["url"], r["zone_id"]) for r in out.collect()}
    assert got == expected

    # lineage metrics cover all 8 parts exactly once
    m = store.metrics(spark, "pip")
    per_part = m.groupBy("part_id").count().collect()
    assert len(per_part) == 8
    assert all(r["count"] == 1 for r in per_part)
    rep = store.lineage_report(spark, "pip")
    assert rep["rows"] == len(expected)
    assert rep["bytes"] > 0

    # idempotent: a third run commits nothing new
    batches_before = store.committed_batches("pip")
    store.run_stage(
        spark, "pip", pages, _transform(zones), lineage_key="url",
        n_parts=8, n_batches=4,
    )
    assert store.committed_batches("pip") == batches_before
