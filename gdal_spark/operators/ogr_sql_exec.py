"""OGR SQL string entry point: ExecuteSQL(statement) -> DataFrame.

Re-expresses the reference's OGR SQL dialect lifecycle
(/root/reference/gcore/gdaldataset.cpp:6985 GDALDataset::ExecuteSQL ->
ogr/swq.cpp parse -> ogr/ogrsf_frmts/generic/ogr_gensql.cpp execution)
as a thin translator onto the existing DataFrame operators, so a user
can hand the engine the same SQL STRING they run today and get the same
rows.  Dialect quirks handled (each pinned by the operators' own tests
and the `ogr_sql_exec` / `ogr_sql_exec_union` driver oracles):

  * SUBSTR with negative/zero offsets (swq_op_general.cpp SWQ_SUBSTR) —
    rewritten through ogr_sql.ogr_substr's shared closed form;
  * CAST(x AS integer/bigint) C-truncation toward zero
    (SWQCastEvaluator) — integral-typed columns cast directly (no
    precision loss above 2^53); floating/string sources go through a
    DOUBLE round-trip so "12.7" truncates to 12 like the reference;
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
  * the FID special field on the primary layer;
  * UNION ALL chains (swq chained poOtherSelect, ogr/ogr_swq.h:446-483)
    — each branch executes independently (its own WHERE/ORDER/LIMIT)
    and results concatenate by position with the FIRST branch's field
    names, matching the swq field-defn-from-first-select rule;
  * table-qualified column names (`layer.col`) — resolved by stripping
    the qualifier when it names a layer in scope (OGR swq qualified
    field lookup); column names must still be unique across the joined
    layers after qualification;
  * LIMIT n OFFSET m (GDAL >= 3.7 dialect).

String literals are masked before any clause splitting, so WHERE
predicates containing tokens like ' ORDER ' or 'UNION ALL' inside a
quoted literal parse correctly.

Grammar subset (the dialect itself has no subqueries/CTEs/GROUP BY):
  SELECT [DISTINCT] items FROM layer
    [LEFT JOIN layer2 ON colA = colB]
    [WHERE predicate] [ORDER BY col [ASC|DESC], ...]
    [LIMIT n] [OFFSET m]
  [UNION ALL SELECT ...]...
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
    r'(?P<onl>[\w.]+|"[^"]+")\s*=\s*(?P<onr>[\w.]+|"[^"]+"))?'
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?"
    r"(?:\s+OFFSET\s+(?P<offset>\d+))?\s*$",
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

# single-quoted SQL string literal, '' = escaped quote (swq lexer rule)
_LIT_RE = re.compile(r"'(?:[^']|'')*'")

_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _mask_literals(text: str) -> str:
    """Replace string-literal contents with same-length \\x01 runs so
    clause regexes can't match keywords inside quoted strings; spans in
    the masked text map 1:1 onto the original."""
    return _LIT_RE.sub(lambda m: "\x01" * len(m.group(0)), text)


def _strip_qualifiers(text: str, layer_names: set[str]) -> str:
    """`layer.col` -> `col` when `layer` is a layer in scope (OGR swq
    qualified field resolution; names must be unique after stripping)."""
    if not layer_names:
        return text
    pat = re.compile(
        r"\b(" + "|".join(re.escape(n) for n in layer_names) + r")\.(\w+)"
    )
    # operate outside string literals only
    out, last = [], 0
    for m in _LIT_RE.finditer(text):
        out.append(pat.sub(r"\2", text[last : m.start()]))
        out.append(m.group(0))
        last = m.end()
    out.append(pat.sub(r"\2", text[last:]))
    return "".join(out)


def _rewrite_expr(text: str, types: dict[str, str] | None = None) -> str:
    """Dialect expression -> Spark SQL expression.  `types` maps column
    name -> Spark simpleString type, used to pick the precision-safe
    direct cast for integral sources."""
    types = types or {}

    def substr_sub(m):
        col, off = m.group(1), int(m.group(2))
        size = int(m.group(3)) if m.group(3) is not None else None
        return _ogr_substr_sql(col, off, size, duck=False)

    def cast_sub(m):
        arg, typ = m.group("arg"), m.group("typ").lower()
        if typ in ("integer", "bigint", "smallint"):
            # SWQCastEvaluator: C cast, truncation toward zero.  Integral
            # sources cast directly (a DOUBLE round-trip would lose
            # precision for |x| >= 2^53); floating/string sources go
            # through DOUBLE so '12.7' truncates like the reference.
            if types.get(arg) in _INTEGRAL_TYPES or re.fullmatch(r"-?\d+", arg):
                return f"CAST({arg} AS BIGINT)"
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


def _split_union(statement: str) -> list[str]:
    """Split a statement into its UNION ALL branches (top-level only —
    literals are masked first, and the dialect has no parenthesized
    subselects)."""
    masked = _mask_literals(statement)
    parts, last = [], 0
    for m in re.finditer(r"\bUNION\s+ALL\b", masked, re.IGNORECASE):
        parts.append(statement[last : m.start()])
        last = m.end()
    parts.append(statement[last:])
    return parts


def execute_ogr_sql(
    spark: SparkSession,
    statement: str,
    layers: dict[str, DataFrame],
    fid_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Run an OGR SQL dialect statement over named layers."""
    branches = _split_union(statement)
    dfs = [_execute_select(spark, b, layers, fid_cols) for b in branches]
    out = dfs[0]
    for d in dfs[1:]:
        # swq chained selects concatenate by position; field definitions
        # come from the first select (ogr_swq.h poOtherSelect chain)
        if len(d.columns) != len(out.columns):
            raise ValueError(
                f"UNION ALL branch column count {len(d.columns)} != "
                f"{len(out.columns)}"
            )
        out = out.union(d.toDF(*out.columns))
    return out


def _execute_select(
    spark: SparkSession,
    statement: str,
    layers: dict[str, DataFrame],
    fid_cols: dict[str, str] | None = None,
) -> DataFrame:
    masked = _mask_literals(statement)
    m = _CLAUSE_RE.match(masked)
    if not m:
        raise ValueError(f"unsupported OGR SQL statement: {statement!r}")

    def grp(name: str) -> str | None:
        s, e = m.span(name)
        return statement[s:e] if s >= 0 else None

    frm = grp("frm") or grp("frmq")
    if frm not in layers:
        raise KeyError(f"unknown layer {frm!r}")
    df = layers[frm]
    fid_cols = fid_cols or {}
    if fid := fid_cols.get(frm):
        # FID special field of the primary layer
        df = df.withColumn("FID", F.col(fid))

    join_name = grp("join") or grp("joinq")
    scope = {frm} | ({join_name} if join_name else set())
    types = dict(df.dtypes)
    if join_name:
        types.update(dict(layers[join_name].dtypes))

    def rw(text: str) -> str:
        return _rewrite_expr(_strip_qualifiers(text, scope), types)

    items = [_alias_of(rw(i)) for i in _split_items(grp("select"))]
    referenced = statement

    if join_name:
        sec = layers[join_name]
        fid = fid_cols.get(join_name)
        if fid is None:
            raise ValueError(
                f"first-match JOIN needs fid_cols[{join_name!r}] (OGR pairs "
                "the first matching secondary feature in FID order)"
            )
        onl = _strip_qualifiers(grp("onl").strip('"'), scope)
        onr = _strip_qualifiers(grp("onr").strip('"'), scope)
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

    if w := grp("where"):
        df = df.filter(F.expr(rw(w)))

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

    if o := grp("order"):
        keys = []
        for part in o.split(","):
            part = part.strip()
            pm = re.match(
                r'^(?:"(?P<q>[^"]+)"|(?P<c>[\w.]+))(?:\s+(?P<dir>ASC|DESC))?$',
                part,
                re.IGNORECASE,
            )
            if not pm:
                raise ValueError(f"unsupported ORDER BY term {part!r}")
            name = pm.group("q") or _strip_qualifiers(pm.group("c"), scope)
            c = F.col(name)
            keys.append(
                c.desc() if (pm.group("dir") or "").upper() == "DESC" else c.asc()
            )
        df = df.orderBy(*keys)
    # OFFSET skips before LIMIT takes (LIMIT n OFFSET m = rows m..m+n)
    if off := grp("offset"):
        df = df.offset(int(off))
    if n := grp("limit"):
        df = df.limit(int(n))
    return df
