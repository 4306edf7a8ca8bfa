"""kNN: nearest pages to each query point.

GDAL core has no kNN operator (nearest appears only as a gridding metric,
/root/reference/alg/gdalgrid.cpp:879 GDALGridNearestNeighbor); the north
star mandates "kNN queries via H3 k-ring expansion with distance
re-ranking". Two strategies:

  * `knn_brute` — exact: broadcast the (small) query set, cross-join against
    pages, haversine re-rank with row_number() <= k. O(|Q| * |pages|)
    distance evals but all JVM-side; fine for |Q| up to thousands even at
    large page counts, and it is the oracle for the cell strategy.
  * `knn_cells` — the 100 TB path: queries explode to their k-ring of hex
    cells at `res` (kernels/hexcell.k_ring), equi-join pages on cell id
    (hash join on a pre-indexed pages column — no pages-side shuffle if
    pages are bucketed by cell), then the same window re-rank. Candidate
    set is the ring disk only: cost O(|Q| * ring * pages_per_cell).
    Approximate in the standard LSH sense: exact iff the true k neighbors
    lie within the ring radius; callers size (res, k_ring) so that
    ring_radius_m >= the k-th-neighbor distance bound they need.

Determinism: ties broken by (dist_m, url) so output is a pure function of
the data — same rule every engine run and the DuckDB oracle can reproduce.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cells_sql import hex_cell
from ..functions.geo import haversine_m


def _rerank(cand: DataFrame, k: int, order_cols) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(*order_cols)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_brute(
    pages: DataFrame,
    queries: DataFrame,
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Exact kNN. queries: (query_id, qlat, qlon). Output: query_id, url,
    dist_m, rank (1..k). Broadcast-nested-loop join: no pages shuffle; the
    only wide op is the per-query top-k window (tiny: |Q|*k rows survive)."""
    p = pages.filter(F.col(lat_col).isNotNull())
    cand = p.crossJoin(F.broadcast(queries)).withColumn(
        "dist_m", haversine_m(F.col(lat_col), F.col(lon_col), F.col("qlat"), F.col("qlon"))
    )
    return _rerank(cand, k, [F.col("dist_m"), F.col("url")]).select(
        "query_id", "url", "dist_m", "rank"
    )


def knn_cells(
    pages: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = 7,
    ring: int = 1,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """H3-style k-ring kNN (north-star strategy).

    queries x ring-disk cells (driver-free explode via posexplode of the
    k_ring array computed in a pandas UDF batch) ⋈ pages indexed by cell.
    """
    from pyspark.sql.types import ArrayType, LongType

    from ..kernels import hexcell as HX

    @F.pandas_udf(ArrayType(LongType()))
    def ring_cells(qlat: pd.Series, qlon: pd.Series) -> pd.Series:
        cells = HX.latlon_to_cell(qlat.to_numpy(), qlon.to_numpy(), res)
        disk = HX.k_ring(cells, ring)
        return pd.Series(list(disk.tolist()))

    q = queries.withColumn("cell", F.explode(ring_cells(F.col("qlat"), F.col("qlon"))))
    p = pages.filter(F.col(lat_col).isNotNull()).withColumn(
        "cell", hex_cell(F.col(lat_col), F.col(lon_col), res)
    )
    cand = p.join(F.broadcast(q), "cell").withColumn(
        "dist_m", haversine_m(F.col(lat_col), F.col(lon_col), F.col("qlat"), F.col("qlon"))
    )
    return _rerank(cand, k, [F.col("dist_m"), F.col("url")]).select(
        "query_id", "url", "dist_m", "rank"
    )
