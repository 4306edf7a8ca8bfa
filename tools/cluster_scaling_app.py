"""spark-submit application for the multi-executor scaling measurement.

Runs the two compute-bound north-star stages (pip_scan: literal-codegen
point-in-polygon membership; pipe_compute: membership + rasterize z8 +
single-shuffle pyramid to z5) on whatever cluster spark-submit provides
— real separate executor JVMs under local-cluster[N,c,mem] — and prints
one JSON line of raw walls. No repo on sys.path: gdal_spark resolves
from --py-files (tools/cluster_scaling.py builds the zip and submits).

    spark-submit --master local-cluster[2,4,3072] \
        --py-files /tmp/gdal_spark_submit.zip \
        tools/cluster_scaling_app.py <total_cores> <reps> <n_scan> <n_pipe>
"""

import json
import sys
import time


def main() -> None:
    total_cores = int(sys.argv[1])
    reps = int(sys.argv[2])
    n_scan = int(sys.argv[3])
    n_pipe = int(sys.argv[4])
    n_mh = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from gdal_spark.kernels.wkb import envelope
    from gdal_spark.operators import tiles as TI
    from gdal_spark.operators.pages import _gen_sql
    from gdal_spark.operators.pip_join import _inside_literal_expr
    from gdal_spark.operators.zones import _zone_specs

    g = _gen_sql("div")

    def gen_ll(nn):
        return (
            spark.range(0, nn, 1, total_cores * 4)
            .withColumnRenamed("id", "doc_id")
            .withColumn("h", F.expr(g["h"]))
            .withColumn("lat_e7", F.expr(g["lat_e7"]))
            .withColumn("lon_e7", F.expr(g["lon_e7"]))
            .withColumn("lat", F.col("lat_e7").cast("double") / 1e7)
            .withColumn("lon", F.col("lon_e7").cast("double") / 1e7)
            .select("doc_id", "lat", "lon")
        )

    terms = []
    for zid, name, wkb_, pred in _zone_specs():
        minx, miny, maxx, maxy = envelope(bytes(wkb_))
        bbox = (
            f"(lon >= {minx!r} AND lon <= {maxx!r}"
            f" AND lat >= {miny!r} AND lat <= {maxy!r})"
        )
        inside = _inside_literal_expr(bytes(wkb_), "lat", "lon")
        terms.append(
            f"(CASE WHEN {bbox} THEN (CASE WHEN {inside} THEN 1 ELSE 0 END)"
            " ELSE 0 END)"
        )
    member = " + ".join(terms)

    def empty_job():
        spark.range(0, total_cores * 4, 1, total_cores * 4).count()

    def pip_scan():
        return (
            gen_ll(n_scan)
            .filter("lat IS NOT NULL")
            .selectExpr(f"({member}) AS m")
            .agg(F.sum("m"))
            .collect()[0][0]
        )

    def pipe_compute():
        p = gen_ll(n_pipe)
        m = (
            p.filter("lat IS NOT NULL")
            .selectExpr(f"({member}) AS m")
            .agg(F.sum("m"))
            .collect()[0][0]
        )
        px = TI.rasterize_points(p, 8)
        nt = (
            TI.pyramid_counts_fast(px, 5, 8)
            .select("zoom", "tx", "ty")
            .distinct()
            .count()
        )
        return m + nt

    def minhash():
        from gdal_spark.operators.dedup import minhash_signatures

        docs = spark.range(0, n_mh, 1, total_cores * 4).selectExpr(
            "id AS doc_id",
            "concat_ws(' ', transform(sequence(0, 29), "
            "i -> substr(md5(concat(CAST(id AS STRING), ':', "
            "CAST(i AS STRING))), 1, 6))) AS text",
        )
        # Consume every band value with a cheap commutative agg.  The
        # earlier count_distinct consumer added a SECOND shuffle of
        # n_mh x 4 md5 strings — a fixed ~1s harness artifact that
        # dominated the stage at small n_mh and mis-read as "minhash
        # doesn't scale"; stage isolation (A=map-only vs B=+groupBy)
        # showed the operator itself scales identically to pip_scan.
        return (
            minhash_signatures(docs)
            .agg(
                F.sum(
                    F.crc32(F.col("band_0"))
                    + F.crc32(F.col("band_1"))
                    + F.crc32(F.col("band_2"))
                    + F.crc32(F.col("band_3"))
                )
            )
            .collect()[0][0]
        )

    def timed(fn):
        fn()  # warm: codegen compile + JIT
        vals = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            vals.append(time.time() - t0)
        return vals

    empty_job()
    floors = []
    for _ in range(5):
        t0 = time.time()
        empty_job()
        floors.append(time.time() - t0)

    out = {
        "total_cores": total_cores,
        "floor": sorted(floors)[len(floors) // 2],
        "pip_scan": timed(pip_scan),
        "pipe_compute": timed(pipe_compute),
        "n_scan": n_scan,
        "n_pipe": n_pipe,
    }
    if n_mh:
        out["minhash"] = timed(minhash)
        out["n_mh"] = n_mh
    print("CLUSTER_SCALING " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
