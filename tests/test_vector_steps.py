"""gdal vector concat / sql steps: modes, field strategies, promotion."""

from pyspark.sql.types import DoubleType, LongType, StringType

from gdal_spark.operators.vector_steps import concat_layers, vector_sql
from gdal_spark.session import local_df


def _layers(spark):
    a = local_df(spark, [(1, "x", 1.5)], "key int, name string, val double")
    b = local_df(spark, [(2, "y", 7)], "key bigint, name string, extra int")
    return a, b


def test_concat_union_nullfill_and_promotion(spark):
    a, b = _layers(spark)
    out = concat_layers(
        [("la", a), ("lb", b)], mode="single", source_layer_field="src"
    )["merged"]
    # int + bigint promotes to bigint (OGRUnionLayer merge lattice)
    assert dict(out.dtypes)["key"] == "bigint"
    rows = {r["src"]: r for r in out.collect()}
    assert rows["la"]["extra"] is None and rows["lb"]["val"] is None
    assert rows["lb"]["key"] == 2


def test_concat_intersection_keeps_common_fields(spark):
    a, b = _layers(spark)
    out = concat_layers([("la", a), ("lb", b)], field_strategy="intersection")
    assert out["merged"].columns == ["key", "name"]


def test_concat_string_promotion(spark):
    a = local_df(spark, [(1,)], "v int")
    b = local_df(spark, [("s",)], "v string")
    out = concat_layers([("la", a), ("lb", b)])["merged"]
    assert dict(out.dtypes)["v"] == "string"
    assert {r["v"] for r in out.collect()} == {"1", "s"}


def test_concat_modes(spark):
    a, b = _layers(spark)
    per_name = concat_layers([("la", a), ("la", b), ("lb", b)],
                             mode="merge-per-layer-name")
    assert set(per_name) == {"la", "lb"}
    assert per_name["la"].count() == 2 and per_name["lb"].count() == 1
    stack = concat_layers([("la", a), ("lb", b)], mode="stack")
    assert stack["la"].count() == 1 and set(stack) == {"la", "lb"}


def test_vector_sql_runs_statement(spark):
    a, _ = _layers(spark)
    out = vector_sql(spark, {"t_a": a}, "SELECT key * 2 AS k2 FROM t_a")
    assert out.collect()[0]["k2"] == 2
