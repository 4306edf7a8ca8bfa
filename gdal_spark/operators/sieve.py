"""Sieve filter: remove raster polygons smaller than a threshold.

Re-expresses GDALSieveFilter (/root/reference/alg/gdalsievefilter.cpp:136):
polygons (connected components of equal value, 4- or 8-connected) smaller
than `threshold` pixels take the value of their LARGEST neighbour; if the
largest neighbour is itself small, the merge chain follows that
polygon's largest neighbour until one >= threshold is reached (:468),
with cycle detection; isolated/unmergable small polygons stay unchanged
(:147). Pinned against the reference autotest checksums
(autotest/alg/sieve.py tests 1,2,4) in tests/test_sieve.py.

Distributed shape: component labels + sizes come from the polygonize
machinery (perimeter-scaled joins); adjacency edges from one neighbor
equi-join on (gx, gy); the big-neighbour map + chain walk run on the
component GRAPH (nodes = polygons, not pixels) — driver-side below
`graph_threshold` edges, same scale posture as polygonize's merge.

Tie handling is ORDER-SENSITIVE in the reference (first scan-order
neighbour wins among equals), so the engine replays the exact
compare-event sequence on the collected component graph — checksums
match the reference bit-for-bit on every fixture including the
all-singletons `unmergable` case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import TILE_SIZE
from .polygonize import polygonize


def sieve(
    pixels: DataFrame,
    threshold: int,
    value_col: str = "value",
    zoom: int | None = None,
    connect8: bool = False,
) -> DataFrame:
    """(zoom, tx, ty, px, py, value) -> same rows with sieved values."""
    labeled = polygonize(pixels, value_col, zoom, connect8).persist()
    g = labeled.select(
        "value", "component", "zoom", "tx", "ty", "px", "py",
        (F.col("tx") * TILE_SIZE + F.col("px")).alias("gx"),
        (F.col("ty") * TILE_SIZE + F.col("py")).alias("gy"),
    )
    sizes = {
        int(r["component"]): int(r["n"])
        for r in g.groupBy("component").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    values = {
        int(r["component"]): int(r["value"])
        for r in g.select("component", "value").distinct().collect()
    }
    # The reference's big-neighbour map is ORDER-SENSITIVE on ties
    # (CompareNeighbour replaces only when strictly bigger): replay its
    # exact compare-event sequence — per pixel in row-major order, the
    # backward partners N, NW, NE, W (diagonals only when 8-connected),
    # each compare updating BOTH polygons' maps. The event list is
    # boundary-sized; it is collected and replayed driver-side (same
    # scale posture as polygonize's component-graph merge).
    nb = g.select(
        F.col("gx").alias("ngx"), F.col("gy").alias("ngy"),
        F.col("component").alias("ncomp"),
    )
    dirs = [(0, -1, 0), (-1, -1, 1), (1, -1, 2), (-1, 0, 3)]
    if not connect8:
        dirs = [(0, -1, 0), (-1, 0, 3)]
    events = []
    for dx, dy, dcode in dirs:
        e = (
            g.withColumn("ngx", F.col("gx") + dx)
            .withColumn("ngy", F.col("gy") + dy)
            .join(nb, ["ngx", "ngy"])
            .filter(F.col("component") != F.col("ncomp"))
            .select("gx", "gy", "component", "ncomp")
            .collect()
        )
        for r in e:
            events.append(
                (int(r["gy"]), int(r["gx"]), dcode, int(r["component"]), int(r["ncomp"]))
            )
    events.sort()

    big: dict = {}
    for _, _, _, a, b in events:
        if a not in big or sizes[big[a]] < sizes[b]:
            big[a] = b
        if b not in big or sizes[big[b]] < sizes[a]:
            big[b] = a

    mapping = {}
    for comp, size in sizes.items():
        if size >= threshold:
            continue
        seen = {comp}
        cur = comp
        final = None
        while True:
            cur = big.get(cur)
            if cur is None:
                break
            if sizes[cur] >= threshold:
                final = cur
                break
            if cur in seen:
                break
            seen.add(cur)
        if final is not None:
            mapping[comp] = values[final]

    if not mapping:
        out = labeled
    else:
        from ..session import local_df

        mdf = local_df(
            labeled.sparkSession,
            [(c, v) for c, v in mapping.items()],
            "component long, new_value long",
        )
        out = labeled.join(F.broadcast(mdf), "component", "left").withColumn(
            "value", F.coalesce("new_value", "value")
        ).drop("new_value")
    return out.select("zoom", "tx", "ty", "px", "py", "value")
