"""XYZ tile assignment, point rasterization, and tile pyramids.

Re-expresses gdal2tiles' GlobalMercator addressing and `gdal raster tile`
pyramiding (SURVEY.md §2.9) as pure Column math + groupBy reduces:

  * tile assignment: lat/lon -> (zoom, tx, ty) via the closed-form chain
    LatLonToMeters -> MetersToPixels -> PixelsToTile
    (/root/reference/swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:444-531),
    including the TMS<->Google y-flip (:511-515). All JVM-side — tile
    assignment of 10^12 rows stays inside WholeStageCodegen, no shuffle.
  * point rasterization: burn page points into 256x256 per-tile count grids
    — pixel = floor(pixel coordinate) (point burn per
    /root/reference/alg/llrasterize.cpp:270-278 GDALdllImagePoint integer
    truncation); MERGE_ALG=ADD semantics = groupBy sum
    (/root/reference/alg/gdalrasterize.cpp:779-817).
  * pyramid: zoom z-1 tile = 2x2 reduce of its four z children — overview
    regeneration (/root/reference/gcore/overview.cpp:4362) with additive
    counts (sum) or GRA_Average semantics for value rasters.

Scale notes: every step is either a narrow projection or a single
groupBy((zoom,tx,ty[,pixel])) hash aggregation with map-side partial
aggregation; pyramid levels shrink 4x per step so the reduce chain is
geometric. Hot tiles (urban skew) are absorbed by AQE + optional salting at
the pixel-agg level (pixel key already splits a tile's rows 65536 ways).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import (
    TILE_SIZE,
    clip_lat,
    mercator_x,
    mercator_y,
    pixels_to_tile,
    pixels_x,
    resolution,
)


def assign_tiles(
    df: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    scheme: str = "google",
) -> DataFrame:
    """Add (zoom, tx, ty) columns. scheme 'tms' or 'google' (y-flip)."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    tx = pixels_to_tile(pixels_x(mercator_x(lon), zoom))
    ty = pixels_to_tile(pixels_x(mercator_y(clip_lat(lat)), zoom))
    if scheme == "google":
        ty = F.lit(2**zoom - 1) - ty
    return (
        df.withColumn("zoom", F.lit(zoom))
        .withColumn("tx", tx)
        .withColumn("ty", ty)
    )


def with_pixels(
    df: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    scheme: str = "google",
) -> DataFrame:
    """Add (zoom, tx, ty, px, py) with px, py guaranteed in 0..255.

    Global pixel = floor(meters-to-pixels); tile = global div 256 and
    in-tile = global mod 256, so tile+pixel are ALWAYS consistent — for a
    point whose global pixel coordinate is an exact multiple of 256,
    PixelsToTile (ceil(p/256)-1, gdal2tiles.py:460-465) would pick the
    west/south tile while floor(p) lands in the east/north one, yielding
    px == 256 (out of range). The pixel path therefore derives the tile
    from the SAME floored coordinate (boundary points land at px=0 of the
    next tile); assign_tiles keeps the reference-exact PixelsToTile rule
    for pure tile assignment. The two differ only on exact-boundary
    points. Google scheme flips py within the flipped tile row so py=0 is
    the tile's north edge (image convention).
    """
    gpx = F.floor(pixels_x(mercator_x(F.col(lon_col)), zoom)).cast("long")
    gpy = F.floor(pixels_x(mercator_y(clip_lat(F.col(lat_col))), zoom)).cast("long")
    tx = (gpx / TILE_SIZE).cast("long")
    ty_tms = (gpy / TILE_SIZE).cast("long")
    px = gpx - tx * TILE_SIZE
    if scheme == "google":
        ty = F.lit(2**zoom - 1) - ty_tms
        py = F.lit(TILE_SIZE - 1) - (gpy - ty_tms * TILE_SIZE)
    else:
        ty = ty_tms
        py = gpy - ty_tms * TILE_SIZE
    return (
        df.withColumn("zoom", F.lit(zoom))
        .withColumn("tx", tx)
        .withColumn("ty", ty)
        .withColumn("px", px.cast("int"))
        .withColumn("py", py.cast("int"))
    )


def rasterize_points(
    df: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    scheme: str = "google",
    value_col: str | None = None,
) -> DataFrame:
    """Burn points into per-pixel counts (or sums of value_col).

    Output: (zoom, tx, ty, px, py, burn) — MERGE_ALG=ADD semantics
    (groupBy sum; /root/reference/alg/gdalrasterize.cpp:817).
    """
    d = with_pixels(
        df.filter(F.col(lat_col).isNotNull()), zoom, lat_col, lon_col, scheme
    )
    agg = (
        F.sum(F.col(value_col)) if value_col else F.count(F.lit(1))
    ).alias("burn")
    return d.groupBy("zoom", "tx", "ty", "px", "py").agg(agg)


def pyramid_counts(
    pixel_df: DataFrame, min_zoom: int, max_zoom: int, materialize: bool = False
) -> DataFrame:
    """Build zoom levels max_zoom-1 .. min_zoom from max_zoom pixel counts.

    Parent pixel (z-1) covers a 2x2 child block (z): parent tile = child
    tile div 2; parent pixel = (child_tile%2)*128 + child_pixel div 2;
    additive burn => sum over the 4 children (overview.cpp 2x2 reduce with
    SUM instead of AVERAGE because counts are extensive). Returns the UNION
    of all levels inc. max_zoom. Each step is one hash agg on 4x fewer keys.

    materialize=False (default): the union's branches share the rasterize
    hash-agg subplan and Spark's ReusedExchange computes it once — measured
    FASTER than persist() (which disables exchange reuse and paid a 24x
    penalty at 2M rows in local mode). materialize=True persists each
    level instead — use when the levels feed several separate actions
    (e.g. per-level table writes with resume semantics,
    apps/gdalalg_raster_tile.cpp:154).
    """
    if materialize:
        pixel_df = pixel_df.persist()
    levels = [pixel_df]
    cur = pixel_df
    for _ in range(max_zoom, min_zoom, -1):
        cur = (
            cur.select(
                (F.col("zoom") - 1).alias("zoom"),
                (F.col("tx") / 2).cast("long").alias("ptx"),
                (F.col("ty") / 2).cast("long").alias("pty"),
                ((F.col("tx") % 2) * (TILE_SIZE // 2) + (F.col("px") / 2).cast("int")).alias("ppx"),
                ((F.col("ty") % 2) * (TILE_SIZE // 2) + (F.col("py") / 2).cast("int")).alias("ppy"),
                "burn",
            )
            .groupBy("zoom", F.col("ptx").alias("tx"), F.col("pty").alias("ty"),
                     F.col("ppx").alias("px"), F.col("ppy").alias("py"))
            .agg(F.sum("burn").alias("burn"))
        )
        if materialize:
            cur = cur.persist()
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def pyramid_counts_fast(pixel_df: DataFrame, min_zoom: int, max_zoom: int) -> DataFrame:
    """All pyramid levels in ONE shuffle: explode each base pixel to its
    ancestor key at every delta (global pixel >> d), then a single hash
    aggregation. Row inflation x(levels) on the narrow key columns buys a
    single wide stage instead of (levels) sequential barrier stages —
    at cluster scale this halves wall-clock and removes the per-stage
    scheduling floor. Results identical to pyramid_counts (tested).
    """
    zdeltas = F.array(*[F.lit(d) for d in range(0, max_zoom - min_zoom + 1)])
    e = pixel_df.select(
        "zoom", "tx", "ty", "px", "py", "burn", F.explode(zdeltas).alias("d")
    )
    # recover TMS global pixel coords, shift by d (div — coords are >= 0),
    # re-split into (tile, pixel), re-apply the google y-flip
    return (
        e.selectExpr(
            f"tx * {TILE_SIZE} + px AS gpx",
            f"(CAST(pow(2, zoom) AS BIGINT) - 1 - ty) * {TILE_SIZE} "
            f"+ ({TILE_SIZE - 1} - py) AS gpy",
            "zoom", "d", "burn",
        )
        .selectExpr(
            "gpx div CAST(pow(2, d) AS BIGINT) AS sgpx",
            "gpy div CAST(pow(2, d) AS BIGINT) AS sgpy",
            "zoom - d AS z2", "burn",
        )
        .selectExpr(
            "CAST(z2 AS INT) AS zoom",
            "sgpx div 256 AS tx",
            "CAST(pow(2, z2) AS BIGINT) - 1 - (sgpy div 256) AS ty",
            f"CAST(sgpx % {TILE_SIZE} AS INT) AS px",
            f"CAST({TILE_SIZE - 1} - (sgpy % {TILE_SIZE}) AS INT) AS py",
            "burn",
        )
        .groupBy("zoom", "tx", "ty", "px", "py")
        .agg(F.sum("burn").alias("burn"))
    )


def tile_counts(
    df: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    scheme: str = "google",
) -> DataFrame:
    """Pages per tile at zoom: (zoom, tx, ty, n_pages). One hash agg."""
    return (
        assign_tiles(df.filter(F.col(lat_col).isNotNull()), zoom, lat_col, lon_col, scheme)
        .groupBy("zoom", "tx", "ty")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


def tile_arrays(pixel_df: DataFrame, tile_size: int = TILE_SIZE) -> DataFrame:
    """Densify per-pixel rows into one array<long> row per tile.

    (zoom,tx,ty,px,py,burn) -> (zoom,tx,ty,tile:array<long>[size*size],
    checksum:int). Vectorized via applyInPandas (Arrow batches, one group
    per tile); checksum = GDALChecksumImage parity
    (/root/reference/alg/gdalchecksum.cpp:48-56) so tile contents can be
    golden-checked the way the reference's autotest does.
    """
    import numpy as np
    import pandas as pd

    from ..kernels.checksum import checksum

    n = tile_size

    def densify(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.zeros(n * n, dtype=np.int64)
        pys = pdf["py"].to_numpy(dtype=np.int64)
        pxs = pdf["px"].to_numpy(dtype=np.int64)
        if len(pxs) and (
            pxs.min() < 0 or pxs.max() >= n or pys.min() < 0 or pys.max() >= n
        ):
            raise ValueError(
                f"pixel out of tile range 0..{n - 1}: "
                f"px [{pxs.min()},{pxs.max()}] py [{pys.min()},{pys.max()}]"
            )
        idx = pys * n + pxs
        np.add.at(arr, idx, pdf["burn"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                "zoom": [int(pdf["zoom"].iloc[0])],
                "tx": [int(pdf["tx"].iloc[0])],
                "ty": [int(pdf["ty"].iloc[0])],
                "tile": [arr.tolist()],
                "checksum": [int(checksum(arr.reshape(n, n)))],
            }
        )

    return pixel_df.groupBy("zoom", "tx", "ty").applyInPandas(
        densify,
        "zoom int, tx long, ty long, tile array<long>, checksum int",
    )
