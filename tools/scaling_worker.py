"""Worker: run the pipeline at one parallelism level, print JSON timings.

Usage: python tools/scaling_worker.py <cores> <n_pages> <runs>
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import prepare_pages, run_minhash_bench, run_pipeline  # noqa: E402
from gdal_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores, n_pages, runs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    spark = get_spark("scaling", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    # identical parquet input for every level (written once, reused)
    path = f"/tmp/gsbench_pages_{n_pages}.parquet"
    prepare_pages(spark, n_pages, path)
    # full-size warm-up: JIT + python workers + this box's very slow
    # first-touch of heap/direct-buffer pages (~130MB/s)
    run_pipeline(spark, n_pages, path)
    results = [run_pipeline(spark, n_pages, path) for _ in range(runs)]
    n_docs = max(n_pages // 32, 100000)
    run_minhash_bench(spark, n_docs)  # warm
    minhash = [run_minhash_bench(spark, n_docs) for _ in range(runs)]
    print(json.dumps({"cores": cores, "runs": results, "minhash": minhash}))


if __name__ == "__main__":
    main()
