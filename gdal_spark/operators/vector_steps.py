"""`gdal vector concat` / `gdal vector sql` pipeline steps.

Re-expresses the reference's layer-concat and SQL pipeline steps
(/root/reference/apps/gdalalg_vector_concat.cpp,
/root/reference/apps/gdalalg_vector_sql.cpp) over DataFrames. A "layer"
here is a named DataFrame; a "dataset" is a dict name -> DataFrame.

concat (gdalalg_vector_concat.cpp:53 modes, :71 field strategies):
  * mode — 'single' (every input layer into one output layer),
    'merge-per-layer-name' (inputs sharing a layer name merge; distinct
    names stay distinct layers), 'stack' (each input layer is its own
    output layer, renamed <dataset>_<layer>).
  * field-strategy — 'union' (OGRUnionLayer FIELD_UNION_ALL_LAYERS:
    every field of every source, first-seen order, missing -> NULL) or
    'intersection' (FIELD_INTERSECTION_ALL_LAYERS: fields present in
    every source, first layer's order). Field types promote through the
    OGRUnionLayer merge lattice (ogrunionlayer.cpp MergeFieldDefn:
    int -> int64 -> real, anything else -> string).
  * source-layer-field — optional extra string field carrying each
    feature's source layer name (SetSourceLayerFieldName).

Spark shape: unionByName(allowMissingColumns) after casting to promoted
types — a zero-shuffle plan (N scans + union); Catalyst pushes filters
and pruning through the union into each branch.

sql (gdalalg_vector_sql.cpp): run SQL statements against the input
layers; each statement yields an output layer. Spark-first: register
each layer as a temp view and hand the statement to Catalyst
(spark.sql), i.e. the engine's SQL dialect *is* the step's dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
)

_NUM_RANK = {IntegerType(): 0, LongType(): 1, FloatType(): 2, DoubleType(): 3}


def _promote(a: DataType, b: DataType) -> DataType:
    """OGRUnionLayer MergeFieldDefn lattice: widen within numerics,
    otherwise fall to string."""
    if a == b:
        return a
    if a in _NUM_RANK and b in _NUM_RANK:
        return a if _NUM_RANK[a] >= _NUM_RANK[b] else b
    return StringType()


def _harmonize(layers: list[tuple[str, DataFrame]], field_strategy: str):
    """Resolve the output field list + promoted types."""
    fields: dict[str, DataType] = {}
    counts: dict[str, int] = {}
    for _, df in layers:
        for f in df.schema.fields:
            counts[f.name] = counts.get(f.name, 0) + 1
            if f.name in fields:
                fields[f.name] = _promote(fields[f.name], f.dataType)
            else:
                fields[f.name] = f.dataType
    if field_strategy == "intersection":
        keep = [
            f.name
            for f in layers[0][1].schema.fields
            if counts.get(f.name, 0) == len(layers)
        ]
    else:
        keep = list(fields)
    return [(n, fields[n]) for n in keep]


def concat_layers(
    layers: list[tuple[str, DataFrame]],
    mode: str = "single",
    field_strategy: str = "union",
    source_layer_field: str | None = None,
    single_name: str = "merged",
) -> dict[str, DataFrame]:
    """gdal vector concat. layers: [(layer_name, df), ...] in dataset
    order. Returns output layers as {name: DataFrame}."""
    if mode == "single":
        groups = {single_name: layers}
    elif mode == "merge-per-layer-name":
        groups = {}
        for name, df in layers:
            groups.setdefault(name, []).append((name, df))
    elif mode == "stack":
        groups = {name: [(name, df)] for name, df in layers}
    else:
        raise ValueError(f"unknown concat mode {mode!r}")

    out: dict[str, DataFrame] = {}
    for out_name, members in groups.items():
        schema = _harmonize(members, field_strategy)
        parts = []
        for lname, df in members:
            have = set(df.columns)
            cols = [
                (F.col(n).cast(t) if n in have else F.lit(None).cast(t)).alias(n)
                for n, t in schema
            ]
            if source_layer_field:
                cols.append(F.lit(lname).alias(source_layer_field))
            parts.append(df.select(*cols))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        out[out_name] = u
    return out


def vector_sql(
    spark: SparkSession,
    layers: dict[str, DataFrame],
    sql: str,
) -> DataFrame:
    """gdal vector sql: one SQL statement over the input layers."""
    for name, df in layers.items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)
