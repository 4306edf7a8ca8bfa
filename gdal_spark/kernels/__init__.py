"""Pure-numpy math kernels. No Spark imports here — these are the unit of
golden-vector testing and are wrapped by pandas_udfs in gdal_spark.functions /
gdal_spark.operators."""
