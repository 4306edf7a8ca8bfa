"""ogr2ogr-style vector translate: the fused per-layer pipeline.

Re-expresses LayerTranslator::Translate
(/root/reference/apps/ogr2ogr_lib.cpp:609+) as one lazy DataFrame
composition — each option maps to the reference's flag:

    where        -where       attribute filter (pushdown-eligible)
    spat         -spat        bbox spatial filter on point columns
    fields       -select      field list / rename map
    t_srs        -t_srs       4326 -> 3857 point reprojection (adds mx/my;
                              closed-form, SetupCT analogue)
    clip_rect    -clipsrc     rectangle clip (the tile-clip special case
                              of the reference's Intersection clip)
    limit        -limit
    fid          -preserve_fid / FID assignment (deterministic hash)

The reference's Arrow fast path (TranslateArrow, ogr2ogr_lib.cpp:549)
"moves whole columnar batches when no row-wise op intervenes" — here
that is automatic: everything is Column math inside Tungsten, so the
whole translate is one codegen stage unless a UDF is injected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import mercator_x, mercator_y


def translate(
    df: DataFrame,
    where: str | None = None,
    spat: tuple | None = None,
    fields: dict | list | None = None,
    t_srs: str | None = None,
    clip_rect: tuple | None = None,
    limit: int | None = None,
    fid_from: str | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    out = df
    if where:
        out = out.filter(F.expr(where))
    box = spat or clip_rect  # for points, -spat and -clipsrc coincide
    if box:
        minx, miny, maxx, maxy = box
        out = out.filter(
            (F.col(lon_col) >= minx) & (F.col(lon_col) <= maxx)
            & (F.col(lat_col) >= miny) & (F.col(lat_col) <= maxy)
        )
    if t_srs == "EPSG:3857":
        out = out.withColumn("mx", mercator_x(F.col(lon_col))).withColumn(
            "my", mercator_y(F.col(lat_col))
        )
    elif t_srs not in (None, "EPSG:4326"):
        raise ValueError(f"unsupported t_srs {t_srs}")
    if fid_from:
        out = out.withColumn("fid", F.xxhash64(F.col(fid_from)))
    if fields:
        if isinstance(fields, dict):
            out = out.select(*[F.col(src).alias(dst) for src, dst in fields.items()])
        else:
            out = out.select(*fields)
    if limit:
        out = out.limit(limit)
    return out
