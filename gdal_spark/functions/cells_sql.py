"""Hex cell assignment as pure Column expressions (JVM-side).

Mirrors kernels/hexcell.py exactly: same mercator closed form, same axial
transform, same cube rounding with floor(x+0.5) ties, same int64 packing.
Hex sizes are embedded as the kernel's precomputed literals (hexcell.SIZES)
so the two layers use bit-identical cell geometry; any last-ulp divergence in
tan/log merely shifts a boundary point to an adjacent cell, which the
superset zone cover + exact refine absorbs.

Cell assignment of the pages table therefore runs entirely inside
WholeStageCodegen — zero Python for 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels.hexcell import SIZES, SQRT3
from .geo import clip_lat, mercator_x, mercator_y

_OFF = 1 << 27


def _axial_round_cols(qf: Column, rf: Column):
    sf = -qf - rf
    q = F.floor(qf + F.lit(0.5))
    r = F.floor(rf + F.lit(0.5))
    s = F.floor(sf + F.lit(0.5))
    dq = F.abs(q.cast("double") - qf)
    dr = F.abs(r.cast("double") - rf)
    ds = F.abs(s.cast("double") - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q2 = F.when(fix_q, -r - s).otherwise(q)
    r2 = F.when(fix_r, -q2 - s).otherwise(r)
    return q2.cast("long"), r2.cast("long")


def hex_cell(lat: Column, lon: Column, res: int, barrier: bool = True) -> Column:
    """lat/lon Columns -> int64 hex cell id at res. NULL-safe (NULL in/out).

    barrier=True (default) wraps the axial coordinates in
    functions/barrier.cheap_once: the cube-rounding CASE tree references
    qf/rf ~9 times, and when lat/lon are themselves derived expressions
    CollapseProject inlines the whole derivation into every reference —
    measured >64KB of generated code (Janino bails to the interpreter,
    +3s per query). cheap_once blocks that inlining while staying inside
    codegen (the shuffle(array()) form of `once` allocates an array per
    row — measured 6x slower on a 1M-row scan; single-evaluation FILTER
    placement isn't needed here, just anti-inlining)."""
    from .barrier import cheap_once

    s = float(SIZES[res])
    mx = mercator_x(lon)
    my = mercator_y(clip_lat(lat))
    qf = (F.lit(float(SQRT3) / 3.0) * mx - my / F.lit(3.0)) / F.lit(s)
    rf = (F.lit(2.0 / 3.0) * my) / F.lit(s)
    if barrier:
        qf, rf = cheap_once(qf), cheap_once(rf)
    q, r = _axial_round_cols(qf, rf)
    # pack(res, q, r): fields are disjoint powers of two, so | == +
    return F.lit(res * (1 << 56)).cast("long") + (q + F.lit(_OFF)) * F.lit(1 << 28) + (r + F.lit(_OFF))


def with_hex_cells(df, lat_col: str = "lat", lon_col: str = "lon", resolutions=(7, 8, 9, 10)):
    """Add hex_r{res} columns for each res — the pages indexing step."""
    for res in resolutions:
        df = df.withColumn(f"hex_r{res}", hex_cell(F.col(lat_col), F.col(lon_col), res))
    return df
