"""Raster -> vector: connected components of equal pixel value.

Re-expresses GDALPolygonize (/root/reference/alg/polygonize.cpp:73
GDALPolygonizeT, 4-connected default / 8CONNECTED option :87) over the
sparse tile-pixel model, as the SURVEY.md §7 "hard part" two-phase plan:

  1. per-tile local components — union-find over the tile's sparse pixels
     inside applyInPandas (a tile is at most 65k pixels; in-memory);
     the provisional label is the component's minimum global pixel id
     (gid = gpy * world_width + gpx), so labels are deterministic;
  2. cross-tile merge — only tile-BORDER pixels participate: adjacent
     pixels in neighboring tiles with equal value yield equivalence edges
     between provisional labels; iterative min-label propagation over
     this (small) label graph runs driver-side joins until fixpoint —
     iteration count is bounded by the diameter of the TILE adjacency
     graph of a component, not its pixel diameter;
  3. pixels re-join the final label mapping.

Output: (value, component, zoom, tx, ty, px, py) with `component` the
global min-gid of the component — a pure function of the raster, so
results are engine-order independent (the reference's polygon ids are
scan-order dependent; we canonicalize by min pixel instead, and tests /
oracles compare component PARTITIONS, value + pixel sets, which is the
semantically meaningful output).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import TILE_SIZE


def _find(parent: dict, a):
    root = a
    while parent[root] != root:
        root = parent[root]
    while parent[a] != root:
        parent[a], a = root, parent[a]
    return root


def _union(parent: dict, a, b):
    ra, rb = _find(parent, a), _find(parent, b)
    if ra != rb:
        if ra < rb:
            parent[rb] = ra
        else:
            parent[ra] = rb


def polygonize(
    pixels: DataFrame,
    value_col: str = "value",
    zoom: int | None = None,
    connect8: bool = False,
) -> DataFrame:
    """Label connected components of equal `value_col`.

    pixels: (zoom, tx, ty, px, py, value). Returns the same rows plus a
    `component` column (global min pixel gid of the component).
    """
    z = zoom if zoom is not None else pixels.select(F.min("zoom")).collect()[0][0]
    world = (1 << z) * TILE_SIZE

    px_df = pixels.select(
        "zoom", "tx", "ty", "px", "py", F.col(value_col).alias("value")
    ).withColumn(
        "gid",
        (F.col("ty") * TILE_SIZE + F.col("py")) * world
        + (F.col("tx") * TILE_SIZE + F.col("px")),
    )

    def local_cc(pdf: pd.DataFrame) -> pd.DataFrame:
        gids = pdf["gid"].to_numpy()
        vals = pdf["value"].to_numpy()
        gx = gids % world
        gy = gids // world
        key = {}
        for g, v in zip(gids, vals):
            key[g] = v
        parent = {int(g): int(g) for g in gids}
        pos = {(int(x), int(y)): (int(g), v) for x, y, g, v in zip(gx, gy, gids, vals)}
        neigh = [(-1, 0), (0, -1)]
        if connect8:
            neigh += [(-1, -1), (1, -1)]
        for (x, y), (g, v) in pos.items():
            for dx, dy in neigh:
                n = pos.get((x + dx, y + dy))
                if n is not None and n[1] == v:
                    _union(parent, g, n[0])
        lbl = np.array([_find(parent, int(g)) for g in gids], dtype=np.int64)
        out = pdf.copy()
        out["label"] = lbl
        return out

    labeled = px_df.groupBy("tx", "ty").applyInPandas(
        local_cc,
        "zoom int, tx long, ty long, px int, py int, value long, gid long, label long",
    )
    labeled = labeled.persist()

    # cross-tile equivalence edges from border-adjacent equal-value pixels
    border = labeled.filter(
        (F.col("px") == 0) | (F.col("px") == TILE_SIZE - 1)
        | (F.col("py") == 0) | (F.col("py") == TILE_SIZE - 1)
    ).select("gid", "value", "label")
    shifts = [1, world]
    if connect8:
        shifts += [world - 1, world + 1]
    a = border.alias("a")
    edges = None
    for s in shifts:
        b = border.select(
            (F.col("gid") - s).alias("gid_match"),
            F.col("value").alias("value_b"),
            F.col("label").alias("label_b"),
        ).alias("b")
        e = a.join(b, (F.col("a.gid") == F.col("gid_match"))
                   & (F.col("a.value") == F.col("value_b"))).select(
            F.col("a.label").alias("la"), F.col("label_b").alias("lb")
        )
        edges = e if edges is None else edges.unionByName(e)
    edge_rows = edges.filter(F.col("la") != F.col("lb")).distinct().collect()
    # The label graph has one node per (tile, component) and one edge per
    # cross-tile adjacency — it scales with TILES, not pixels, so solving
    # it centrally is fine far beyond this sandbox (millions of edges =
    # megabytes). A distributed min-label-propagation loop is the fallback
    # past that.
    parent: dict = {}
    for r in edge_rows:
        a, b = int(r["la"]), int(r["lb"])
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        _union(parent, a, b)
    mapping = [(lbl, _find(parent, lbl)) for lbl in parent]
    if mapping:
        mdf = labeled.sparkSession.createDataFrame(mapping, "label long, comp long")
        out = labeled.join(F.broadcast(mdf), "label", "left").withColumn(
            "component", F.coalesce(F.col("comp"), F.col("label"))
        )
    else:
        out = labeled.withColumn("component", F.col("label"))
    return out.select("value", "component", "zoom", "tx", "ty", "px", "py")


def component_summary(labeled: DataFrame) -> DataFrame:
    """Per-component aggregate: (value, n_pixels, min gid rank) — the
    partition-level view used by tests/oracles."""
    return labeled.groupBy("value", "component").agg(
        F.count(F.lit(1)).alias("n_pixels")
    )
