"""Distributed viewshed: many observers over one DEM.

The in-raster sweep is a wavefront recurrence (each cell depends on the
previous line), so the parallel axis is the OBSERVER — exactly the
reference's cumulative mode (/root/reference/alg/viewshed/cumulative.cpp
computes an observer grid and sums visibility). `cumulative_viewshed`
broadcasts the (dense) DEM, fans observers out with mapInPandas, runs
the reference-exact kernel per observer, and reduces per-pixel
visibility counts with one hash aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cumulative_viewshed(
    observers: DataFrame, dem: np.ndarray, observer_z: float = 0.0
) -> DataFrame:
    """observers: (ox, oy) rows. Returns (gx, gy, n_visible) — how many
    observers see each pixel (alg/viewshed/cumulative.cpp semantics)."""
    from ..kernels.viewshed import viewshed

    sc = observers.sparkSession.sparkContext
    bdem = sc.broadcast(np.asarray(dem, dtype=np.float64))

    def run(it):
        for pdf in it:
            outs = []
            for ox, oy in zip(pdf["ox"], pdf["oy"]):
                vis, _ = viewshed(bdem.value, int(ox), int(oy), observer_z)
                ys, xs = np.nonzero(vis)
                outs.append(pd.DataFrame({"gx": xs, "gy": ys}))
            yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                {"gx": [], "gy": []}
            )

    per_obs = observers.repartition("ox", "oy").mapInPandas(run, "gx long, gy long")
    return per_obs.groupBy("gx", "gy").agg(F.count(F.lit(1)).alias("n_visible"))
