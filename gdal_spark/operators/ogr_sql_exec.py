"""OGR SQL string entry point: ExecuteSQL(statement) -> DataFrame.

Re-expresses the reference's OGR SQL dialect lifecycle
(/root/reference/gcore/gdaldataset.cpp:6985 GDALDataset::ExecuteSQL ->
ogr/swq.cpp parse -> ogr/ogrsf_frmts/generic/ogr_gensql.cpp execution)
as a thin translator onto the existing DataFrame operators, so a user
can hand the engine the same SQL STRING they run today and get the same
rows.  Dialect quirks handled (each pinned by the operators' own tests
and the `ogr_sql_exec` driver oracle):

  * SUBSTR with negative/zero offsets (swq_op_general.cpp SWQ_SUBSTR) —
    rewritten through ogr_sql.ogr_substr's shared closed form;
  * CAST(x AS integer/bigint) C-truncation toward zero
    (SWQCastEvaluator) — rewritten to a double round-trip cast;
  * ILIKE case-insensitive match (GDAL >= 3.1: LIKE is case-SENSITIVE,
    ILIKE insensitive — ogr_sql_dialect.rst:290); both engines accept
    ILIKE natively with those semantics, so it passes through;
  * summary records — ANY aggregate in the select list collapses the
    result to ONE row, no GROUP BY exists (SWQM_SUMMARY_RECORD,
    ogr_gensql.cpp:1058);
  * single-column DISTINCT (SWQM_DISTINCT_LIST);
  * first-match-only LEFT JOIN — one output row per primary feature,
    paired with the FIRST matching secondary feature in FID order
    (ogr_gensql.cpp:1497-1537); needs `fid_cols[secondary]`;
  * the FID special field on the primary layer.

Grammar subset (the dialect itself has no subqueries/CTEs/GROUP BY):
  SELECT [DISTINCT] items FROM layer
    [LEFT JOIN layer2 ON colA = colB]
    [WHERE predicate] [ORDER BY col [ASC|DESC], ...] [LIMIT n]
Column names must be unambiguous across the joined layers (OGR resolves
table qualifiers; this translator requires unqualified unique names).
SUBSTR offsets/sizes must be integer literals.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ogr_sql import _ogr_substr_sql, first_match_left_join

_CLAUSE_RE = re.compile(
    r"^\s*SELECT\s+(?P<distinct>DISTINCT\s+)?(?P<select>.*?)"
    r'\s+FROM\s+(?:"(?P<frmq>[^"]+)"|(?P<frm>\w+))'
    r'(?:\s+LEFT\s+JOIN\s+(?:"(?P<joinq>[^"]+)"|(?P<join>\w+))\s+ON\s+'
    r"(?P<onl>[\w.]+)\s*=\s*(?P<onr>[\w.]+))?"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>[\w\s,.]+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_SUBSTR_RE = re.compile(
    r"SUBSTR\s*\(\s*([\w.]+)\s*,\s*(-?\d+)\s*(?:,\s*(-?\d+)\s*)?\)",
    re.IGNORECASE,
)

_CAST_RE = re.compile(
    r"CAST\s*\(\s*(?P<arg>[\w.]+)\s+AS\s+"
    r"(?P<typ>integer|bigint|smallint|float|real|numeric|"
    r"character(?:\s*\(\s*\d+\s*\))?|string)\s*\)",
    re.IGNORECASE,
)

_AGG_RE = re.compile(
    r"\b(MIN|MAX|AVG|SUM|COUNT|STDDEV_POP|STDDEV_SAMP)\s*\(", re.IGNORECASE
)


def _rewrite_expr(text: str) -> str:
    """Dialect expression -> Spark SQL expression."""

    def substr_sub(m):
        col, off = m.group(1), int(m.group(2))
        size = int(m.group(3)) if m.group(3) is not None else None
        return _ogr_substr_sql(col, off, size, duck=False)

    def cast_sub(m):
        arg, typ = m.group("arg"), m.group("typ").lower()
        if typ in ("integer", "bigint", "smallint"):
            # SWQCastEvaluator: C cast, truncation toward zero
            return f"CAST(CAST({arg} AS DOUBLE) AS BIGINT)"
        if typ in ("float", "real", "numeric"):
            return f"CAST({arg} AS DOUBLE)"
        return f"CAST({arg} AS STRING)"

    text = _SUBSTR_RE.sub(substr_sub, text)
    text = _CAST_RE.sub(cast_sub, text)
    return text


def _split_items(select: str) -> list[str]:
    """Split the select list on top-level commas."""
    items, depth, cur = [], 0, []
    for ch in select:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        items.append("".join(cur).strip())
    return items


def _alias_of(item: str) -> tuple[str, str]:
    """(expression, alias) — synthesize OGR-style names when absent
    (aggregates name as lowerfn_col, ogr_sql_dialect.rst:65)."""
    m = re.match(r"^(.*?)\s+AS\s+(\w+)\s*$", item, re.IGNORECASE | re.DOTALL)
    if m:
        return m.group(1).strip(), m.group(2)
    m = _AGG_RE.match(item.strip())
    if m:
        inner = item.strip()[m.end() : -1].strip().replace("DISTINCT ", "")
        return item, f"{m.group(1).lower()}_{re.sub(r'[^0-9A-Za-z_]+', '', inner)}"
    return item, item.strip()


def execute_ogr_sql(
    spark: SparkSession,
    statement: str,
    layers: dict[str, DataFrame],
    fid_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Run an OGR SQL dialect statement over named layers."""
    m = _CLAUSE_RE.match(statement)
    if not m:
        raise ValueError(f"unsupported OGR SQL statement: {statement!r}")
    frm = m.group("frm") or m.group("frmq")
    if frm not in layers:
        raise KeyError(f"unknown layer {frm!r}")
    df = layers[frm]
    fid_cols = fid_cols or {}
    if fid := fid_cols.get(frm):
        # FID special field of the primary layer
        df = df.withColumn("FID", F.col(fid))

    items = [_alias_of(_rewrite_expr(i)) for i in _split_items(m.group("select"))]
    referenced = statement

    if m.group("join") or m.group("joinq"):
        join_name = m.group("join") or m.group("joinq")
        sec = layers[join_name]
        fid = fid_cols.get(join_name)
        if fid is None:
            raise ValueError(
                f"first-match JOIN needs fid_cols[{join_name!r}] (OGR pairs "
                "the first matching secondary feature in FID order)"
            )
        onl, onr = m.group("onl"), m.group("onr")
        if onl in sec.columns and onr in df.columns:
            onl, onr = onr, onl
        if not (onl in df.columns and onr in sec.columns):
            raise ValueError(f"ON {onl} = {onr} does not span the layers")
        carry = [
            c for c in sec.columns
            if c != onr and re.search(rf"\b{re.escape(c)}\b", referenced)
        ]
        df = first_match_left_join(
            df,
            sec.withColumnRenamed(onr, onl),
            key=onl,
            fid_col=fid,
            sec_cols=carry,
        )

    if w := m.group("where"):
        df = df.filter(F.expr(_rewrite_expr(w)))

    is_summary = any(_AGG_RE.search(e) for e, _ in items)
    if is_summary:
        # SWQM_SUMMARY_RECORD: aggregates collapse to one row
        df = df.agg(*[F.expr(e).alias(a) for e, a in items])
    else:
        cols = [
            F.col("*") if e.strip() == "*" else F.expr(e).alias(a)
            for e, a in items
        ]
        df = df.select(*cols)
        if m.group("distinct"):
            df = df.distinct()

    if o := m.group("order"):
        keys = []
        for part in o.split(","):
            part = part.strip()
            pm = re.match(r"^([\w.]+)(?:\s+(ASC|DESC))?$", part, re.IGNORECASE)
            if not pm:
                raise ValueError(f"unsupported ORDER BY term {part!r}")
            c = F.col(pm.group(1))
            keys.append(
                c.desc() if (pm.group(2) or "").upper() == "DESC" else c.asc()
            )
        df = df.orderBy(*keys)
    if n := m.group("limit"):
        df = df.limit(int(n))
    return df
