"""gdal_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-creates GDAL's core raster/vector query semantics (see SURVEY.md for the
full operator inventory with reference file:line citations) as idiomatic
Spark DataFrame operators over web-page tables:

* ``kernels``   — pure-numpy math kernels (no Spark import): spherical-mercator
  closed forms, affine geotransform, WKB codec, ray-cast point-in-polygon,
  GDAL checksum, hex (H3-style) + S2 cell indexing.
* ``functions`` — Column-expression builders (JVM-side, whole-stage codegen;
  no Python in the hot path) for the same math where expressible in SQL.
* ``operators`` — DataFrame→DataFrame verbs: pages synthesis/extraction,
  point-in-polygon join, tile assignment + pyramid, rasterize, warp, kNN,
  ogr2ogr-style translate, checkpoint/resume.
* ``pipeline``  — training-data-pipeline ops: dedup (exact/minhash/simhash),
  ANN similarity search, text quality/language stats, multimodal plumbing.

Not a port: the reference (/root/reference, GDAL 3.12.0dev) defines WHAT is
computed; execution is DataFrame/Catalyst-first.
"""

__version__ = "0.1.0"
