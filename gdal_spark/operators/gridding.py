"""Point-to-grid interpolation (the gdal_grid families).

Re-expresses /root/reference/alg/gdalgrid.cpp:
  * GDALGridInverseDistanceToAPower (:109) — w = 1/(d^2 + smooth^2)^(p/2),
    coincident point (d < eps) takes the point value directly;
  * GDALGridMovingAverage (:629) — mean over the search radius,
    min_points gate;
  * GDALGridNearestNeighbor (:879) — closest point's value.

Distributed shape (the 10^12-point path): points and grid nodes bucket
into radius-sized cells; nodes meet candidate points through a 3x3
bucket-key equi-join (one explode + one hash join, no cross product),
then the per-node reduction is a plain groupBy aggregation. For power=2
every weight is RATIONAL (1/(dx^2+dy^2+s^2)), so the whole operator —
join keys, distance filter, weighted sums — runs inside whole-stage
codegen with zero Python, and a DuckDB oracle can reproduce it exactly.

The reference's no-radius mode ("all points contribute") is the same
code with radius >= the data extent. Nodes failing min_points are
omitted (the reference writes its nodata value there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS2 = 1e-24  # coincident-point guard (squared), gdalgrid dfEpsilon class


def _node_grid(spark, x0, y0, dx, dy, nx, ny):
    return spark.range(nx * ny).select(
        (F.col("id") % nx).cast("long").alias("ix"),
        (F.col("id") / nx).cast("long").alias("iy"),
    ).select(
        "ix", "iy",
        (F.lit(x0) + F.col("ix") * F.lit(dx)).alias("nx_"),
        (F.lit(y0) + F.col("iy") * F.lit(dy)).alias("ny_"),
    )


def _candidates(points, nodes, radius, x_col, y_col, v_col):
    """3x3 bucket-key join: candidate (node, point) pairs within radius."""
    r = float(radius)
    p = points.select(
        F.col(x_col).alias("px"), F.col(y_col).alias("py"),
        F.col(v_col).alias("pv"),
        F.floor(F.col(x_col) / r).cast("long").alias("bx"),
        F.floor(F.col(y_col) / r).cast("long").alias("by"),
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ])
    n = nodes.withColumn("o", F.explode(offs)).select(
        "ix", "iy", "nx_", "ny_",
        (F.floor(F.col("nx_") / r).cast("long") + F.col("o.ox")).alias("bx"),
        (F.floor(F.col("ny_") / r).cast("long") + F.col("o.oy")).alias("by"),
    )
    cand = n.join(p, ["bx", "by"]).withColumn(
        "d2",
        (F.col("px") - F.col("nx_")) * (F.col("px") - F.col("nx_"))
        + (F.col("py") - F.col("ny_")) * (F.col("py") - F.col("ny_")),
    )
    return cand.filter(F.col("d2") <= F.lit(r * r))


def grid_invdist(
    points: DataFrame, x0, y0, dx, dy, nx, ny,
    radius: float, power: float = 2.0, smoothing: float = 0.0,
    min_points: int = 1,
    x_col: str = "x", y_col: str = "y", v_col: str = "v",
) -> DataFrame:
    """Inverse-distance-to-a-power grid: (ix, iy, value, n_points)."""
    nodes = _node_grid(points.sparkSession, x0, y0, dx, dy, nx, ny)
    cand = _candidates(points, nodes, radius, x_col, y_col, v_col)
    s2 = smoothing * smoothing
    if power == 2.0:
        w = 1.0 / (F.col("d2") + F.lit(s2))
    else:
        w = 1.0 / F.pow(F.col("d2") + F.lit(s2), power / 2.0)
    agg = cand.groupBy("ix", "iy").agg(
        F.sum(F.col("pv") * w).alias("wv"),
        F.sum(w).alias("ww"),
        F.count(F.lit(1)).alias("n_points"),
        F.min("d2").alias("mind2"),
        # coincident-point rule: MIN(pv) among all points with d2 < EPS2
        # (one documented rule shared with the oracle; GDAL itself takes
        # the first sub-eps point in scan order, gdalgrid.cpp:190)
        F.min(F.when(F.col("d2") < EPS2, F.col("pv"))).alias("near_v"),
    )
    return agg.filter(F.col("n_points") >= min_points).select(
        "ix", "iy",
        F.when(F.col("mind2") < EPS2, F.col("near_v"))
        .otherwise(F.col("wv") / F.col("ww"))
        .alias("value"),
        "n_points",
    )


def grid_average(
    points: DataFrame, x0, y0, dx, dy, nx, ny,
    radius: float, min_points: int = 1,
    x_col: str = "x", y_col: str = "y", v_col: str = "v",
) -> DataFrame:
    """Moving-average grid (gdalgrid.cpp:629): (ix, iy, value, n_points)."""
    nodes = _node_grid(points.sparkSession, x0, y0, dx, dy, nx, ny)
    cand = _candidates(points, nodes, radius, x_col, y_col, v_col)
    agg = cand.groupBy("ix", "iy").agg(
        (F.sum("pv") / F.count(F.lit(1))).alias("value"),
        F.count(F.lit(1)).alias("n_points"),
    )
    return agg.filter(F.col("n_points") >= min_points)


def grid_linear(
    points: DataFrame, x0, y0, dx, dy, nx, ny,
    x_col: str = "x", y_col: str = "y", v_col: str = "v",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Linear (Delaunay TIN) interpolation, GDALGridLinear semantics
    (alg/gdalgrid.cpp:2459): triangulate the points (driver-side
    Bowyer-Watson — the point table is the small side, same compile
    pattern as zones), broadcast the triangle table, locate each grid
    node via a bbox-gated broadcast join + barycentric containment, and
    interpolate the three vertex values. Nodes outside the convex hull
    are omitted (the reference writes nodata). Output: (ix, iy, value).
    """
    rows = points.select(x_col, y_col, v_col).limit(driver_threshold + 1).collect()
    if len(rows) > driver_threshold:
        raise ValueError(
            f"grid_linear: > {driver_threshold} points; driver-side "
            "triangulation is the supported path (reference uses a global "
            "qhull triangulation too)"
        )
    from ..kernels.delaunay import delaunay
    from ..session import local_df

    pts = [(float(r[x_col]), float(r[y_col])) for r in rows]
    vals = [float(r[v_col]) for r in rows]
    tris = delaunay(pts)
    trows = []
    for ti, (a, b, c) in enumerate(tris):
        (x1, y1), (x2, y2), (x3, y3) = pts[a], pts[b], pts[c]
        trows.append(
            (ti, x1, y1, vals[a], x2, y2, vals[b], x3, y3, vals[c],
             min(x1, x2, x3), min(y1, y2, y3), max(x1, x2, x3), max(y1, y2, y3))
        )
    tdf = local_df(
        points.sparkSession, trows,
        "tri_id int, x1 double, y1 double, v1 double, x2 double, y2 double, "
        "v2 double, x3 double, y3 double, v3 double, "
        "bminx double, bminy double, bmaxx double, bmaxy double",
    )
    nodes = _node_grid(points.sparkSession, x0, y0, dx, dy, nx, ny)
    cond = (
        (F.col("nx_") >= F.col("bminx")) & (F.col("nx_") <= F.col("bmaxx"))
        & (F.col("ny_") >= F.col("bminy")) & (F.col("ny_") <= F.col("bmaxy"))
    )
    j = nodes.join(F.broadcast(tdf), cond)
    det = (F.col("y2") - F.col("y3")) * (F.col("x1") - F.col("x3")) + (
        F.col("x3") - F.col("x2")
    ) * (F.col("y1") - F.col("y3"))
    l1 = (
        (F.col("y2") - F.col("y3")) * (F.col("nx_") - F.col("x3"))
        + (F.col("x3") - F.col("x2")) * (F.col("ny_") - F.col("y3"))
    ) / det
    l2 = (
        (F.col("y3") - F.col("y1")) * (F.col("nx_") - F.col("x3"))
        + (F.col("x1") - F.col("x3")) * (F.col("ny_") - F.col("y3"))
    ) / det
    l3 = 1.0 - l1 - l2
    inside = (l1 >= -1e-12) & (l2 >= -1e-12) & (l3 >= -1e-12)
    val = l1 * F.col("v1") + l2 * F.col("v2") + l3 * F.col("v3")
    # shared-edge nodes match 2 triangles with identical interpolated
    # value; keep the lowest tri_id deterministically
    return (
        j.filter(inside)
        .withColumn("_val", val)
        .groupBy("ix", "iy")
        .agg(F.min_by("_val", "tri_id").alias("value"))
    )


def grid_nearest(
    points: DataFrame, x0, y0, dx, dy, nx, ny,
    radius: float,
    x_col: str = "x", y_col: str = "y", v_col: str = "v",
) -> DataFrame:
    """Nearest-neighbor grid (gdalgrid.cpp:879); ties break by (d2, value)
    so output is engine-order independent: (ix, iy, value, d2)."""
    nodes = _node_grid(points.sparkSession, x0, y0, dx, dy, nx, ny)
    cand = _candidates(points, nodes, radius, x_col, y_col, v_col)
    return cand.groupBy("ix", "iy").agg(
        F.min_by("pv", F.struct("d2", "pv")).alias("value"),
        F.min("d2").alias("d2"),
    )
