"""kNN: nearest pages to each query point.

GDAL core has no kNN operator (nearest appears only as a gridding metric,
/root/reference/alg/gdalgrid.cpp:879 GDALGridNearestNeighbor); the north
star mandates "kNN queries via H3 k-ring expansion with distance
re-ranking". Two strategies:

  * `knn_brute` — exact: broadcast the (small) query set, cross-join against
    pages, haversine re-rank. O(|Q| * |pages|) distance evals but all
    JVM-side; the oracle for the cell strategy.
  * `knn_cells` — the 100 TB path: queries explode to their k-ring of hex
    cells at `res` (kernels/hexcell.k_ring), equi-join pages on cell id
    (hash join on a pre-indexed pages column — no pages-side shuffle if
    pages are bucketed by cell). Candidate set is the ring disk only:
    cost O(|Q| * ring * pages_per_cell). Approximate in the standard LSH
    sense: exact iff the true k neighbors lie within the ring radius;
    callers size (res, k_ring) so ring_radius_m >= the k-th-neighbor
    distance bound they need. Small query sets compute their ring disks
    driver-side (no python-worker spin-up); large ones via pandas_udf.

Both re-rank through operators/topk.topk_per_group — a salted two-phase
top-k with NO single-task-per-query sort (the earlier
Window.partitionBy(query_id) plan funneled every candidate of a query
into one task; at corpus scale that task sorts the whole corpus).

Determinism: ties broken by (dist_m, url) so output is a pure function of
the data — same rule every engine run and the DuckDB oracle can reproduce.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells_sql import hex_cell
from ..functions.geo import haversine_m
from .topk import topk_per_group


def _rerank(cand: DataFrame, k: int) -> DataFrame:
    return topk_per_group(
        cand,
        ["query_id"],
        [F.col("dist_m"), F.col("url")],
        ["url", "dist_m"],
        k,
    ).select("query_id", "url", "dist_m", "rank")


def knn_brute(
    pages: DataFrame,
    queries: DataFrame,
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    sample_bound: float | None = None,
) -> DataFrame:
    """Exact kNN. queries: (query_id, qlat, qlon). Output: query_id, url,
    dist_m, rank (1..k). Broadcast-nested-loop join: no pages shuffle; the
    re-rank is the salted two-phase top-k (|Q| * salt_parts tasks).

    sample_bound (0..1): threshold-refinement for large |Q| x |pages| —
    without it, every candidate row rides the top-k shuffle. A first pass
    over a `sample_bound` fraction computes each query's sample k-th
    distance; the k-th distance in ANY subset is >= the true k-th
    distance, so filtering the full scan to dist <= bound provably keeps
    all true top-k while shuffling only ~k/sample_bound rows per query.
    (Queries with < k sampled candidates get no bound — nothing is
    dropped.) Distance evals stay O(|Q| x N) codegen either way; the
    SHUFFLE drops from O(|Q| x N) to O(|Q| x k / sample_bound)."""
    p = pages.filter(F.col(lat_col).isNotNull())

    def cand_of(pp):
        return pp.crossJoin(F.broadcast(queries)).withColumn(
            "dist_m",
            haversine_m(F.col(lat_col), F.col(lon_col), F.col("qlat"), F.col("qlon")),
        )

    cand = cand_of(p)
    if sample_bound:
        sk = _rerank(cand_of(p.sample(fraction=sample_bound, seed=7)), k)
        bounds = sk.groupBy("query_id").agg(
            F.max("dist_m").alias("_bound"), F.count(F.lit(1)).alias("_nb")
        ).select(
            "query_id",
            F.when(F.col("_nb") >= k, F.col("_bound")).alias("_bound"),
        )
        cand = cand.join(F.broadcast(bounds), "query_id", "left").filter(
            F.col("_bound").isNull() | (F.col("dist_m") <= F.col("_bound"))
        )
    return _rerank(cand, k)


def _ring_cells_df(queries: DataFrame, res: int, ring: int,
                   driver_threshold: int = 10_000) -> DataFrame:
    """(query_id, qlat, qlon, cell) — one row per ring-disk cell.

    Local/small query tables compute disks driver-side and return a
    single LocalRelation (no Spark job, no Arrow worker spin-up, no
    join); large distributed ones go through a pandas_udf explode."""
    import numpy as np

    from pyspark.sql.types import ArrayType, LongType

    from ..kernels import hexcell as HX

    small = queries.isLocal() or queries.limit(driver_threshold + 1).count() <= driver_threshold
    if small:
        rows = queries.select("query_id", "qlat", "qlon").collect()
        qlat = np.array([r["qlat"] for r in rows] or [0.0])
        qlon = np.array([r["qlon"] for r in rows] or [0.0])
        disks = HX.k_ring(HX.latlon_to_cell(qlat, qlon, res), ring)
        flat = [
            (int(r["query_id"]), float(r["qlat"]), float(r["qlon"]), int(c))
            for r, disk in zip(rows, disks)
            for c in disk
        ]
        from ..session import local_df

        return local_df(queries.sparkSession,
            flat, "query_id int, qlat double, qlon double, cell long"
        )

    @F.pandas_udf(ArrayType(LongType()))
    def ring_cells(qlat: pd.Series, qlon: pd.Series) -> pd.Series:
        cells = HX.latlon_to_cell(qlat.to_numpy(), qlon.to_numpy(), res)
        disk = HX.k_ring(cells, ring)
        return pd.Series(list(disk.tolist()))

    return queries.withColumn(
        "cell", F.explode(ring_cells(F.col("qlat"), F.col("qlon")))
    )


def index_pages_by_cell(
    pages: DataFrame,
    res: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    partitions: int | None = None,
) -> DataFrame:
    """Cell index over pages: the column `knn_cells` joins on. Build
    ONCE and reuse across query batches — at 100 TB this is a bucketed
    write (`bucketBy(n, "cell")`) maintained with the table, so the
    per-query cost is only the ring-disk probe, never a corpus rescan
    through the cube-rounding cell transform. Locally: persist() the
    result. `partitions` pre-shuffles by cell so downstream joins can
    reuse the partitioning."""
    p = pages.filter(F.col(lat_col).isNotNull()).withColumn(
        "cell", hex_cell(F.col(lat_col), F.col(lon_col), res)
    )
    if partitions:
        p = p.repartition(partitions, "cell")
    return p


def knn_cells(
    pages: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = 7,
    ring: int = 1,
    lat_col: str = "lat",
    lon_col: str = "lon",
    indexed: bool = False,
) -> DataFrame:
    """H3-style k-ring kNN (north-star strategy): queries x ring-disk
    cells ⋈ pages indexed by cell, then salted two-phase top-k.
    `indexed=True` means pages already carry the `cell` column from
    index_pages_by_cell(res) — res MUST match the index resolution."""
    q = _ring_cells_df(queries, res, ring)
    if indexed:
        p = pages
    else:
        p = index_pages_by_cell(pages, res, lat_col, lon_col)
    cand = p.join(F.broadcast(q), "cell").withColumn(
        "dist_m", haversine_m(F.col(lat_col), F.col(lon_col), F.col("qlat"), F.col("qlon"))
    )
    return _rerank(cand, k)
