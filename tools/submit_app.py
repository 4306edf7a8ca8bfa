"""spark-submit application for the north-rule launch-mode check.

The north rule requires the pipeline to run "via spark-submit
--py-files" — i.e. with the gdal_spark package importable ONLY from the
shipped zip, never from a repo checkout on sys.path. This script is the
application: it deliberately does NOT sys.path.insert the repo, so a
successful run proves driver + executor imports resolve from --py-files
alone (pandas_udf closures unpickling gdal_spark.kernels on workers
included). It delegates to the canonical checkpointed pipeline
entry point (gdal_spark/pipeline.py), which prints one JSON lineage
report per stage; tools/submit_smoke.sh runs it twice and asserts the
second pass resumes with zero new batches.

    spark-submit --master local[8] --py-files /tmp/gdal_spark_submit.zip \
        tools/submit_app.py --sf-dir /root/testdata/sf0.01 --store /tmp/x
"""

# no repo on sys.path: gdal_spark must resolve from --py-files
from gdal_spark import pipeline

if __name__ == "__main__":
    pipeline.main()
