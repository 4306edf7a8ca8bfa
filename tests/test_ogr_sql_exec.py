"""execute_ogr_sql vs the reference's own expected lists
(/root/reference/autotest/ogr/ogr_sql_test.py tests 2-7, reconstructed
poly/idlink fixture layers: poly.shp EAS_IDs in FID order, idlink names).
Result ORDER for un-ORDER-BY'd statements is engine-defined (OGR returns
encounter order, a distributed engine cannot) — those compare as sets;
every ORDER BY list compares exactly."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.ogr_sql_exec import execute_ogr_sql

POLY_EAS = [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]
IDLINK_EAS = [158, 165, 166, 168, 170, 171, 179]


@pytest.fixture(scope="module")
def layers(spark):
    from gdal_spark.session import local_df

    poly = local_df(
        spark,
        [(i, eas, f"35043{360 + i}") for i, eas in enumerate(POLY_EAS)],
        "fid int, eas_id int, prfedea string",
    )
    idlink = local_df(
        spark,
        [(i, eas, f"_{eas}_") for i, eas in enumerate(IDLINK_EAS)],
        "fid int, eas_id int, name string",
    )
    return {"poly": poly, "idlink": idlink}


def _vals(df, col):
    return [r[col] for r in df.collect()]


def test_where_count(spark, layers):
    # test_ogr_sql_1: eas_id < 167 -> 3 features
    out = execute_ogr_sql(
        spark, "SELECT eas_id FROM poly WHERE eas_id < 167", layers
    )
    assert out.count() == 3


def test_distinct(spark, layers):
    # test_ogr_sql_2 (set compare: encounter order is engine-defined)
    out = execute_ogr_sql(
        spark, "select distinct eas_id from poly where eas_id < 170", layers
    )
    assert sorted(_vals(out, "eas_id")) == sorted([168, 169, 166, 158, 165])


def test_distinct_order_asc_desc(spark, layers):
    # test_ogr_sql_3 / _3_desc: exact ordered lists
    out = execute_ogr_sql(
        spark,
        "select distinct eas_id from poly where eas_id < 170 order by eas_id",
        layers,
    )
    assert _vals(out, "eas_id") == [158, 165, 166, 168, 169]
    out = execute_ogr_sql(
        spark,
        "select distinct eas_id from poly where eas_id < 170 "
        "order by eas_id desc",
        layers,
    )
    assert _vals(out, "eas_id") == [169, 168, 166, 165, 158]


def test_distinct_strings_order(spark, layers):
    # test_ogr_sql_4
    out = execute_ogr_sql(
        spark, "select distinct name from idlink order by name asc", layers
    )
    assert _vals(out, "name") == [
        "_158_", "_165_", "_166_", "_168_", "_170_", "_171_", "_179_",
    ]


def test_summary_record(spark, layers):
    # test_ogr_sql_5: aggregates collapse to ONE row, OGR alias names
    out = execute_ogr_sql(
        spark,
        "select max(eas_id), min(eas_id), avg(eas_id), "
        "STDDEV_POP(eas_id), STDDEV_SAMP(eas_id), sum(eas_id), "
        "count(eas_id) from idlink",
        layers,
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["max_eas_id"] == 179
    assert r["min_eas_id"] == 158
    assert r["avg_eas_id"] == pytest.approx(168.142857142857, abs=1e-9)
    assert r["stddev_pop_eas_id"] == pytest.approx(5.9384599116647205, rel=1e-12)
    assert r["stddev_samp_eas_id"] == pytest.approx(6.414269805898183, rel=1e-12)
    assert r["count_eas_id"] == 7
    assert r["sum_eas_id"] == 1177


def test_fid_special_field(spark, layers):
    # test_ogr_sql_7: FID of eas_id in (158,165) -> [7, 8]
    out = execute_ogr_sql(
        spark,
        "SELECT eas_id, FID FROM poly WHERE eas_id in (158,165) ORDER BY FID",
        layers,
        fid_cols={"poly": "fid"},
    )
    assert _vals(out, "FID") == [7, 8]


def test_first_match_join(spark, layers):
    """OGR LEFT JOIN pairs the FIRST secondary match in FID order: give
    idlink a duplicate eas_id and check the lower-fid row wins."""
    from gdal_spark.session import local_df

    dup = local_df(
        spark,
        [(0, 158, "first"), (1, 158, "second"), (2, 165, "only")],
        "fid int, eas_id int, tag string",
    )
    out = execute_ogr_sql(
        spark,
        "SELECT eas_id, tag FROM poly LEFT JOIN dups ON eas_id = eas_id "
        "WHERE eas_id in (158,165) ORDER BY eas_id",
        {**layers, "dups": dup},
        fid_cols={"dups": "fid"},
    )
    got = {(r["eas_id"], r["tag"]) for r in out.collect()}
    assert got == {(158, "first"), (165, "only")}


def test_wildcard_and_quoted_table(spark, layers):
    # test_ogr_sql_8 / _9: SELECT * expansion, quoted table names
    out = execute_ogr_sql(
        spark,
        'select * from "poly" where eas_id in (158,165) ORDER BY fid',
        layers,
    )
    assert [r["prfedea"] for r in out.collect()] == ["35043367", "35043368"]
    assert out.columns == ["fid", "eas_id", "prfedea"]


def test_substr_cast_ilike(spark, layers):
    """SUBSTR negative offset, CAST C-truncation, ILIKE through the
    string API in one statement."""
    from gdal_spark.session import local_df

    t = local_df(
        spark,
        [(1, "AbCdEf", -3.9), (2, "xxxxx", 2.9), (3, "nope", 7.1)],
        "id int, s string, v double",
    )
    out = execute_ogr_sql(
        spark,
        "SELECT id, SUBSTR(s, -2) AS tail, CAST(v AS integer) AS vi "
        "FROM t WHERE s ILIKE '%CDE%' ORDER BY id",
        {"t": t},
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["tail"] == "Ef"
    assert rows[0]["vi"] == -3  # truncation toward zero, not floor/round


def test_union_all_chain(spark, layers):
    """swq chained selects: branches run independently, concatenate by
    position with the FIRST branch's field names."""
    out = execute_ogr_sql(
        spark,
        "SELECT eas_id FROM poly WHERE eas_id < 160 "
        "UNION ALL select eas_id from idlink where eas_id > 175 "
        "UNION ALL SELECT eas_id FROM poly WHERE eas_id = 165",
        layers,
    )
    assert out.columns == ["eas_id"]
    assert sorted(_vals(out, "eas_id")) == [158, 165, 179]


def test_union_all_positional_names(spark, layers):
    # second branch's different column names fold into the first's
    out = execute_ogr_sql(
        spark,
        "SELECT eas_id, prfedea FROM poly WHERE eas_id = 158 "
        "UNION ALL SELECT eas_id, name FROM idlink WHERE eas_id = 179",
        layers,
    )
    assert out.columns == ["eas_id", "prfedea"]
    got = {(r["eas_id"], r["prfedea"]) for r in out.collect()}
    assert got == {(158, "35043367"), (179, "_179_")}


def test_table_qualified_columns(spark, layers):
    out = execute_ogr_sql(
        spark,
        "SELECT poly.eas_id, idlink.name FROM poly "
        "LEFT JOIN idlink ON poly.eas_id = idlink.eas_id "
        "WHERE poly.eas_id in (158, 169) ORDER BY poly.eas_id",
        layers,
        fid_cols={"idlink": "fid"},
    )
    rows = out.collect()
    assert [(r["eas_id"], r["name"]) for r in rows] == [
        (158, "_158_"), (169, None),
    ]


def test_limit_offset(spark, layers):
    out = execute_ogr_sql(
        spark,
        "SELECT eas_id FROM poly ORDER BY eas_id LIMIT 3 OFFSET 2",
        layers,
    )
    assert _vals(out, "eas_id") == sorted(POLY_EAS)[2:5]
    out = execute_ogr_sql(
        spark, "SELECT eas_id FROM poly ORDER BY eas_id OFFSET 8", layers
    )
    assert _vals(out, "eas_id") == sorted(POLY_EAS)[8:]


def test_cast_bigint_precision(spark):
    """Integral sources cast directly: 2^53+1 survives (a DOUBLE
    round-trip would round it); string sources still truncate."""
    from gdal_spark.session import local_df

    big = (1 << 53) + 1
    t = local_df(spark, [(big, "12.7")], "v long, s string")
    out = execute_ogr_sql(
        spark,
        "SELECT CAST(v AS bigint) AS vb, CAST(s AS integer) AS si FROM t",
        {"t": t},
    ).collect()
    assert out[0]["vb"] == big
    assert out[0]["si"] == 12


def test_keywords_inside_string_literals(spark, layers):
    """' ORDER ' / 'UNION ALL' inside literals must not split clauses."""
    out = execute_ogr_sql(
        spark,
        "SELECT eas_id, ' ORDER BY x UNION ALL y' AS note FROM poly "
        "WHERE prfedea <> 'no UNION ALL here' AND eas_id < 160",
        layers,
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["note"] == " ORDER BY x UNION ALL y"


def test_summary_union_branch(spark, layers):
    """Aggregate-in-select collapse inside a UNION ALL branch."""
    out = execute_ogr_sql(
        spark,
        "SELECT min(eas_id) AS v FROM poly "
        "UNION ALL SELECT max(eas_id) AS v FROM idlink",
        layers,
    )
    assert sorted(_vals(out, "v")) == [158, 179]
