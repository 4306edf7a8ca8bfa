"""Page cell indexing: hex res 7..10 (JVM) + S2 levels 12..16 (Arrow).

The north-star pages layout: every geotagged page carries hex cell ids
at res 7-10 (join/bucket keys — computed as pure Column math,
functions/cells_sql.py, zero Python at 10^12 rows) and S2 cell ids at
levels 12-16 (kernels/s2cell.py — quadratic-ST cube projection per the
published S2 spec; vectorized numpy behind one pandas_udf, since the
face/Hilbert bit logic is not economically expressible in SQL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..functions.cells_sql import with_hex_cells
from ..kernels import s2cell as S2

S2_LEVELS = (12, 13, 14, 15, 16)
HEX_RESOLUTIONS = (7, 8, 9, 10)


@F.pandas_udf(ArrayType(LongType()))
def _s2_levels(lat: pd.Series, lon: pd.Series) -> pd.Series:
    la = lat.to_numpy(dtype=np.float64, na_value=np.nan)
    lo = lon.to_numpy(dtype=np.float64, na_value=np.nan)
    ok = ~np.isnan(la)
    out = np.zeros((len(la), len(S2_LEVELS)), dtype=np.int64)
    if ok.any():
        leaf = S2.latlon_to_leaf(la[ok], lo[ok])
        for k, lvl in enumerate(S2_LEVELS):
            out[ok, k] = S2.parent_at(leaf, lvl)
    result = [None if not o else row.tolist() for o, row in zip(ok, out)]
    return pd.Series(result)


def with_cells(
    df: DataFrame, lat_col: str = "lat", lon_col: str = "lon"
) -> DataFrame:
    """Add hex_r{7..10} (JVM Column math) and s2_l{12..16} columns."""
    df = with_hex_cells(df, lat_col, lon_col, HEX_RESOLUTIONS)
    arr = _s2_levels(F.col(lat_col), F.col(lon_col))
    df = df.withColumn("_s2", arr)
    for k, lvl in enumerate(S2_LEVELS):
        df = df.withColumn(f"s2_l{lvl}", F.col("_s2").getItem(k))
    return df.drop("_s2")
