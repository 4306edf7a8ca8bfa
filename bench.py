"""Benchmark harness: headline queries + end-to-end pipeline throughput.

Runs each __spark_entry__ query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], then the full synthetic
pipeline (generate -> extract -> PIP join -> rasterize -> pyramid) at
BENCH_PAGES rows, and prints ONE JSON line.

Scaling-efficiency evidence (BASELINE.md protocol) comes from
tools/scaling_bench.py which runs the same pipeline at two parallelism
levels; this file is the per-round driver entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from gdal_spark.operators import tiles as TI  # noqa: E402
from gdal_spark.operators.pages import extract_geo, synthetic_pages  # noqa: E402
from gdal_spark.operators.pip_join import pip_join_broadcast  # noqa: E402
from gdal_spark.operators.zones import zones_df  # noqa: E402
from gdal_spark.session import get_spark  # noqa: E402


def run_pipeline(spark, n_pages: int) -> dict:
    """Full north-star pipeline on synthetic pages; returns timings."""
    t0 = time.time()
    pages = synthetic_pages(spark, n_pages).select("url", "warc_ts", "html", "text", "lang")
    p = extract_geo(pages)
    j = pip_join_broadcast(p, zones_df(spark))
    n_joined = j.count()
    t_join = time.time()
    px = TI.rasterize_points(p, 8)
    pyr = TI.pyramid_counts(px, 5, 8)
    n_tiles = pyr.select("zoom", "tx", "ty").distinct().count()
    t_pyr = time.time()
    return {
        "pages": n_pages,
        "joined_rows": n_joined,
        "tiles": n_tiles,
        "extract_join_sec": round(t_join - t0, 3),
        "pyramid_sec": round(t_pyr - t_join, 3),
        "total_sec": round(t_pyr - t0, 3),
        "pages_per_sec": round(n_pages / (t_pyr - t0), 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    n_bench = int(os.environ.get("BENCH_PAGES", "1000000"))
    spark = get_spark("gdal-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in E.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        # force full execution without driver materialization cost
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    pipe = run_pipeline(spark, n_bench)

    out = {
        "metric": "headline-query wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pipeline": pipe,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
