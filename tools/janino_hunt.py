"""Attribute codegen (janino) compile failures to the query that
triggers them.

Spark logs janino failures (CodeGenerator "failed to compile" /
"Code ... grows beyond 64 KB") to the JVM's stderr, which is the same
fd as this process's stderr — so a flushed marker line written between
queries interleaves in order and attributes any stacktrace to the
query running when it appeared.

Run:  python tools/janino_hunt.py 2> /tmp/janino.log
Then: python tools/janino_hunt.py --report /tmp/janino.log
"""
from __future__ import annotations

import os
import sys
import time

MARK = "=== JANINO_HUNT query="


def report(path: str) -> None:
    cur = "<preamble>"
    hits: dict[str, list[str]] = {}
    with open(path, errors="replace") as f:
        for line in f:
            if MARK in line:
                cur = line.split(MARK, 1)[1].strip()
                continue
            low = line.lower()
            if ("janino" in low or "failed to compile" in low
                    or "grows beyond 64 kb" in low
                    or "compileexception" in low):
                hits.setdefault(cur, []).append(line.rstrip()[:200])
    if not hits:
        print("no janino/codegen-compile failures found")
        return
    for q, lines in hits.items():
        print(f"--- {q}: {len(lines)} matching log lines")
        for ln in lines[:4]:
            print("   ", ln)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--report":
        report(sys.argv[2])
        return
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    from gdal_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("janino-hunt")
    # WARN so WholeStageCodegenExec fallback notices are captured too
    spark.sparkContext.setLogLevel("WARN")

    def mark(name: str) -> None:
        print(f"{MARK}{name}", file=sys.stderr, flush=True)

    queries = E.queries()
    for name, fn in queries.items():
        mark(name)
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"ok {name} {time.time()-t0:.1f}s", flush=True)
        except Exception as exc:  # keep hunting
            print(f"ERR {name}: {exc}", flush=True)
    mark("<bench-pipeline>")
    import bench
    bench.run_pipeline(spark, 100000)
    mark("<bench-warp>")
    bench.run_warp_bench(spark, 1024)
    mark("<bench-knn>")
    bench.run_knn_bench(spark)
    mark("<done>")


if __name__ == "__main__":
    main()
