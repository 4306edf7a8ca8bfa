"""OGR SQL dialect semantics as DataFrame operators.

Re-expresses the quirky corners of the reference's OGR SQL engine
(/root/reference/ogr/ogrsf_frmts/generic/ogr_gensql.cpp and
/root/reference/ogr/swq_op_general.cpp) so a user of the reference's
ExecuteSQL gets identical rows from Spark:

  * summary records — OGR SQL has no GROUP BY; any aggregate in the select
    list collapses the result to ONE row (SWQM_SUMMARY_RECORD,
    ogr/ogr_swq.h:67-75, execution ogr_gensql.cpp:1058).
  * first-match-only joins — OGR `LEFT JOIN ... ON` emits exactly one row
    per primary feature, pairing the FIRST matching secondary feature in
    FID order (ogr_gensql.cpp:1497-1537 pushdown nested loop;
    doc/source/user/ogr_sql_dialect.rst:514). Spark: window row_number()
    over (partition by key order by fid) == 1 — a hash join + one narrow
    window, no nested loop.
  * SUBSTR with negative/zero offsets — swq_op_general.cpp SWQ_SUBSTR:
    1-based; offset 0 behaves as 1; negative offset counts from the end
    clamped at 0; missing size defaults to 100000; size<0 or offset past
    the end yields ''.
  * CAST truncation — SWQCastEvaluator uses C casts (truncate toward
    zero), unlike DuckDB's rounding CAST.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def summary_record(df: DataFrame, *aggs: Column) -> DataFrame:
    """SWQM_SUMMARY_RECORD: aggregates collapse to a single row."""
    return df.agg(*aggs)


def distinct_list(df: DataFrame, col: str) -> DataFrame:
    """SWQM_DISTINCT_LIST (ogr/ogr_swq.h:322): single-column DISTINCT."""
    return df.select(col).distinct()


def first_match_left_join(
    primary: DataFrame,
    secondary: DataFrame,
    key: str,
    fid_col: str,
    sec_cols: list[str],
) -> DataFrame:
    """OGR LEFT JOIN: one output row per primary row, first secondary match
    in FID order; unmatched -> nulls. `sec_cols` are the secondary columns
    to carry (reference carries the full secondary feature)."""
    w = Window.partitionBy(key).orderBy(fid_col)
    first = (
        secondary.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key, *sec_cols)
    )
    return primary.join(first, key, "left")


def _ogr_substr_sql(s: str, off: int, size: int | None, duck: bool) -> str:
    """Shared SQL text for OGR SUBSTR on both engines (identical syntax)."""
    sz = 100000 if size is None else size
    ln = f"length({s})"
    zb = (
        f"(CASE WHEN {off} > 0 THEN {off} - 1 "
        f"WHEN {off} < 0 THEN GREATEST({ln} + {off}, 0) ELSE 0 END)"
    )
    fn = "substr" if duck else "substring"
    return (
        f"(CASE WHEN {sz} < 0 OR {zb} > {ln} THEN '' "
        f"ELSE {fn}({s}, {zb} + 1, GREATEST(LEAST({sz}, {ln} - {zb}), 0)) END)"
    )


def ogr_substr(col: str, off: int, size: int | None = None) -> Column:
    """OGR SUBSTR (swq_op_general.cpp SWQ_SUBSTR) as a Column."""
    return F.expr(_ogr_substr_sql(col, off, size, duck=False))


def ogr_substr_sql(col: str, off: int, size: int | None = None) -> str:
    """DuckDB oracle text for the same expression."""
    return _ogr_substr_sql(col, off, size, duck=True)


def ogr_cast_int(col: Column) -> Column:
    """CAST(x AS INTEGER) with C truncation semantics (SWQCastEvaluator).
    Spark's double->int cast already truncates toward zero."""
    return col.cast("long")


def cents(col: str) -> Column:
    """Deterministic money/quantity fixed-point: floor(x*100 + 0.5) — the
    reference's own rounding rule (llrasterize.cpp:109 floor(x+0.5)).
    Makes SUM over doubles exactly reproducible across engines/partitions
    (bigint addition is associative; double sums are not)."""
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


def cents_sql(col: str) -> str:
    return f"CAST(FLOOR({col} * 100 + 0.5) AS BIGINT)"
