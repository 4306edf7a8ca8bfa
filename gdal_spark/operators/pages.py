"""The `pages` table: Common-Crawl-style web pages with embedded geotags.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Two generators, both fully deterministic and UDF-free (pure Column math):

* ``pages_from_documents`` — derives pages 1:1 from the driver-provided
  ``documents`` parquet via integer-hash column math. The SAME math is
  emitted as a DuckDB CTE by ``pages_cte_sql()`` so every geo query can be
  oracle-checked: Spark and DuckDB compute identical rows (integer lattice
  coordinates; doubles only via exact integer/10^7 division).
* ``synthetic_pages`` — spark.range-based generator for benchmarks; same
  formulas, arbitrary row count, scales linearly with partitions (this is
  the 10^12-row path: no driver-side data, no skew in generation itself).

Geotag distribution per FIXTURES.md F1: ~63% in 5 urban hotspots (hot-cell
skew per north rule), ~27% uniform, ~10% no geotag. Geotags are embedded in
the html as ``<meta name="geo.position" content="{lat_e7};{lon_e7}">`` with
integer microdegree*10 (1e-7 deg) coordinates so float formatting can never
diverge between engines; the text extractor invariant (byte-identical text
per url) is enforced by construction + re-extraction tests.

Hotspot jitter lives on the lattice ``base + k*2000`` (e7 units) and uniform
points on ``k*100000``; zone boundaries (zones.py) are chosen ≡1000 (mod
2000) so no generated point ever lies exactly on a zone edge — ray-cast vs
half-open-interval boundary semantics cannot disagree on this data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, lat_e7, lon_e7) — 5 urban hotspots
HOTSPOTS = [
    ("nyc", 407100000, -740000000),
    ("london", 515000000, -1200000),
    ("tokyo", 356800000, 1396900000),
    ("saopaulo", -235500000, -466300000),
    ("delhi", 286100000, 772000000),
]

_LAT_CASE = "CASE h % 5 " + " ".join(
    f"WHEN {i} THEN {lat}" for i, (_, lat, _) in enumerate(HOTSPOTS)
) + " END"
_LON_CASE = "CASE h % 5 " + " ".join(
    f"WHEN {i} THEN {lon}" for i, (_, _, lon) in enumerate(HOTSPOTS)
) + " END"


def _gen_sql(div: str) -> dict[str, str]:
    """Shared generation formulas; `div` is the integer-division operator
    ('div' for Spark SQL, '//' for DuckDB)."""

    def d(a: str, b: int) -> str:
        return f"(({a}) {div} {b})" if div == "div" else f"(({a}) // {b})"

    return {
        "h": "(doc_id * 1103515245 + 12345) % 2147483648",
        "has_geo": "(h % 100) < 90",
        "is_hot": "(h % 100) < 63",
        "lat_e7": (
            f"CASE WHEN (h % 100) >= 90 THEN NULL "
            f"WHEN (h % 100) < 63 THEN ({_LAT_CASE}) + (({d('h', 100)} % 2001) - 1000) * 2000 "
            f"ELSE -600000000 + ({d('h', 7)} % 13001) * 100000 END"
        ),
        "lon_e7": (
            f"CASE WHEN (h % 100) >= 90 THEN NULL "
            f"WHEN (h % 100) < 63 THEN ({_LON_CASE}) + (({d('h', 205)} % 2001) - 1000) * 2000 "
            f"ELSE -1800000000 + ({d('h', 11)} % 36000) * 100000 END"
        ),
        "url": "concat('https://', source, '.example/p', CAST(doc_id AS STRING))",
        "html_str": (
            "CASE WHEN lat_e7 IS NULL THEN "
            "concat('<html><head></head><body><p>', text, '</p></body></html>') "
            "ELSE concat('<html><head><meta name=\"geo.position\" content=\"', "
            "CAST(lat_e7 AS STRING), ';', CAST(lon_e7 AS STRING), "
            "'\"></head><body><p>', text, '</p></body></html>') END"
        ),
    }


def pages_from_documents(spark: SparkSession, sf_dir: str, keep_internal: bool = False) -> DataFrame:
    """documents.parquet -> pages DataFrame (deterministic, oracle-parity).

    keep_internal=True retains doc_id/lat_e7/lon_e7/lat/lon helper columns
    (exactly what extraction would recompute — see extract_geo round-trip
    test); False returns the canonical 5-column input_hint schema.
    """
    g = _gen_sql("div")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = (
        docs.withColumn("h", F.expr(g["h"]))
        .withColumn("lat_e7", F.expr(g["lat_e7"]))
        .withColumn("lon_e7", F.expr(g["lon_e7"]))
        .withColumn("url", F.expr(g["url"]))
        .withColumn(
            "warc_ts",
            F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,h % 525600,0)"),
        )
        .withColumn("html_str", F.expr(g["html_str"].replace("STRING", "STRING")))
        .withColumn("html", F.encode("html_str", "UTF-8"))
    )
    if keep_internal:
        df = df.withColumn("lat", F.col("lat_e7").cast("double") / 10000000.0).withColumn(
            "lon", F.col("lon_e7").cast("double") / 10000000.0
        )
        return df.select(
            "doc_id", "url", "warc_ts", "html", "text", "lang", "lat_e7", "lon_e7", "lat", "lon"
        )
    return df.select("url", "warc_ts", "html", "text", "lang")


def pages_cte_sql() -> str:
    """DuckDB CTE producing rows identical to pages_from_documents(
    keep_internal=True). Embed as: WITH pages AS (<this>) SELECT ..."""
    g = _gen_sql("//")
    return f"""
    SELECT doc_id, url,
           TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (h % 525600) MINUTE AS warc_ts,
           text, lang, lat_e7, lon_e7,
           CAST(lat_e7 AS DOUBLE) / 10000000.0 AS lat,
           CAST(lon_e7 AS DOUBLE) / 10000000.0 AS lon
    FROM (
      SELECT *,
             {g['url'].replace('AS STRING', 'AS VARCHAR')} AS url,
             {g['lat_e7'].replace('AS STRING', 'AS VARCHAR')} AS lat_e7,
             {g['lon_e7'].replace('AS STRING', 'AS VARCHAR')} AS lon_e7
      FROM (SELECT *, {g['h']} AS h FROM documents)
    )
    """


def extract_text_expr(html_col: str = "html") -> F.Column:
    """Deterministic text extractor: bytes between '<p>' and '</p>'.

    text = substr(html, pos('<p>')+3, pos('</p>') - pos('<p>') - 3).
    Pure Column expr — the per-url byte-identical invariant (input_hint)
    holds because this is a pure function of html.
    """
    return F.expr(
        f"substring(decode({html_col}, 'UTF-8'), locate('<p>', decode({html_col}, 'UTF-8')) + 3, "
        f"locate('</p>', decode({html_col}, 'UTF-8')) - locate('<p>', decode({html_col}, 'UTF-8')) - 3)"
    )


from ..functions.barrier import once as _once


def extract_geo(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Re-extract lat/lon from the geo.position meta tag (NULL if absent).

    Mirrors the generation lattice exactly — validated by round-trip test.
    """
    s = F.decode(F.col(html_col), "UTF-8")
    has = F.locate('name="geo.position"', s) > 0
    content = F.regexp_extract(s, 'content="(-?\\d+);(-?\\d+)"', 1)
    content2 = F.regexp_extract(s, 'content="(-?\\d+);(-?\\d+)"', 2)
    lat_e7 = F.when(has, content.cast("long")).otherwise(F.lit(None).cast("long"))
    lon_e7 = F.when(has, content2.cast("long")).otherwise(F.lit(None).cast("long"))
    return (
        df.withColumn("lat_e7", _once(lat_e7))
        .withColumn("lon_e7", _once(lon_e7))
        .withColumn("lat", F.col("lat_e7").cast("double") / 10000000.0)
        .withColumn("lon", F.col("lon_e7").cast("double") / 10000000.0)
    )


def synthetic_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Scalable bench generator: n rows, same geo distribution, text is a
    deterministic function of id. Linear scan, no shuffle, no Python."""
    g = _gen_sql("div")
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    df = (
        df.withColumnRenamed("id", "doc_id")
        .withColumn("source", F.concat(F.lit("src"), (F.col("doc_id") % 1000).cast("string")))
        .withColumn(
            "text",
            F.concat(
                F.lit("page body "),
                F.col("doc_id").cast("string"),
                F.lit(" "),
                F.repeat(F.lit("lorem ipsum dolor sit amet "), 8),
            ),
        )
        .withColumn("lang", F.element_at(F.array(*[F.lit(x) for x in ["en", "de", "fr", "es", "ja"]]), (F.col("doc_id") % 5 + 1).cast("int")))
        .withColumn("h", F.expr(g["h"]))
        .withColumn("lat_e7", F.expr(g["lat_e7"]))
        .withColumn("lon_e7", F.expr(g["lon_e7"]))
        .withColumn("url", F.expr(g["url"]))
        .withColumn(
            "warc_ts",
            F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,h % 525600,0)"),
        )
        .withColumn("html_str", F.expr(g["html_str"]))
        .withColumn("html", F.encode("html_str", "UTF-8"))
        .withColumn("lat", F.col("lat_e7").cast("double") / 10000000.0)
        .withColumn("lon", F.col("lon_e7").cast("double") / 10000000.0)
    )
    return df.select(
        "doc_id", "url", "warc_ts", "html", "text", "lang", "lat_e7", "lon_e7", "lat", "lon"
    )
