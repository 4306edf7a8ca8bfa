"""Distributed contour extraction (marching squares over block rasters).

The reference's contour generator (/root/reference/alg/contour.cpp +
alg/marching_squares/) walks the raster sequentially; here each block
emits the segments of the squares whose top-left node it owns, using a
1-node halo from its right/bottom/diagonal neighbors (same exchange
pattern as the focal ops — NaN-padded, so halo-incomplete squares are
suppressed on the block that doesn't own them and produced exactly once
by the block that does). Output: georeferenced segment soup
(level, x1, y1, x2, y2); polyline stitching is a driver-side
concatenation like polygonize's component merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.contour import contour_segments
from ..kernels.geotransform import apply_geotransform
from .raster import RasterMeta


def contour(blocks: DataFrame, meta: RasterMeta, levels: list[float]) -> DataFrame:
    """Marching-squares segments for each level, georeferenced via the
    raster geotransform. One shuffle (halo exchange)."""
    bs = meta.block
    nbx, nby = meta.nbx, meta.nby
    width, height = meta.width, meta.height
    gt = meta.gt

    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (0, -1)
            for dx in (0, -1)
        ]
    )
    contrib = (
        blocks.withColumn("o", F.explode(offsets))
        .select(
            (F.col("bx") + F.col("o.dx")).alias("tbx"),
            (F.col("by") + F.col("o.dy")).alias("tby"),
            "bx", "by", "w", "h", "block",
        )
        .filter(
            (F.col("tbx") >= 0) & (F.col("tbx") < nbx)
            & (F.col("tby") >= 0) & (F.col("tby") < nby)
        )
    )

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        tbx = int(pdf["tbx"].iloc[0])
        tby = int(pdf["tby"].iloc[0])
        dw = min(bs, width - tbx * bs)
        dh = min(bs, height - tby * bs)
        pad = np.full((dh + 1, dw + 1), np.nan)
        x0g, y0g = tbx * bs, tby * bs
        for _, r in pdf.iterrows():
            arr = np.asarray(r["block"], dtype=np.float64).reshape(r["h"], r["w"])
            bx0, by0 = r["bx"] * bs, r["by"] * bs
            ix0, iy0 = max(bx0, x0g), max(by0, y0g)
            ix1 = min(bx0 + r["w"], x0g + dw + 1)
            iy1 = min(by0 + r["h"], y0g + dh + 1)
            if ix1 <= ix0 or iy1 <= iy0:
                continue
            pad[iy0 - y0g : iy1 - y0g, ix0 - x0g : ix1 - x0g] = arr[
                iy0 - by0 : iy1 - by0, ix0 - bx0 : ix1 - bx0
            ]
        rows = []
        for level in levels:
            segs = contour_segments(pad, level, x_off=x0g, y_off=y0g)
            if len(segs) == 0:
                continue
            gx1, gy1 = apply_geotransform(gt, segs[:, 0], segs[:, 1])
            gx2, gy2 = apply_geotransform(gt, segs[:, 2], segs[:, 3])
            for a, b, c, d in zip(gx1, gy1, gx2, gy2):
                rows.append((float(level), float(a), float(b), float(c), float(d)))
        return pd.DataFrame(
            rows, columns=["level", "x1", "y1", "x2", "y2"]
        )

    return contrib.groupBy("tbx", "tby").applyInPandas(
        emit, "level double, x1 double, y1 double, x2 double, y2 double"
    )


def contour_polygons(blocks: DataFrame, meta: RasterMeta, levels: list[float]) -> DataFrame:
    """Iso-polygon contouring (gdal_contour -p; alg/contour.cpp polygon
    writer): one polygon set per level band, sub-pixel boundaries on the
    marching-squares chords.

    Distributed plan (3 shuffles, each strictly smaller):
      1. halo exchange (same as contour()) — each block cuts its squares
         into per-band pieces (kernels/contour.split_square_bands) and
         cancels interior edge pairs LOCALLY, so only block-perimeter +
         band-boundary edges leave the worker (O(sqrt(block area)));
      2. global JVM groupBy (band, edge key) drops cross-block pairs —
         survivors are exactly the band boundaries (O(total perimeter));
      3. per-band applyInPandas chains boundary edges into rings
         (kernels/contour.chain_rings), signs outers/holes, assigns each
         hole to its smallest containing outer, georeferences, emits one
         multipolygon per band.
    Band k = number of levels strictly below the value (open bands below
    levels[0] / above levels[-1] included, matching the writer)."""
    import pandas as _pd

    from ..kernels.contour import chain_rings, split_square_bands
    from ..kernels.makevalid import _canon_ring, _in_ring
    from ..kernels import wkb as _W

    bs = meta.block
    nbx, nby = meta.nbx, meta.nby
    width, height = meta.width, meta.height
    gt = meta.gt

    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (0, -1)
            for dx in (0, -1)
        ]
    )
    contrib = (
        blocks.withColumn("o", F.explode(offsets))
        .select(
            (F.col("bx") + F.col("o.dx")).alias("tbx"),
            (F.col("by") + F.col("o.dy")).alias("tby"),
            "bx", "by", "w", "h", "block",
        )
        .filter(
            (F.col("tbx") >= 0) & (F.col("tbx") < nbx)
            & (F.col("tby") >= 0) & (F.col("tby") < nby)
        )
    )

    def emit_edges(pdf: _pd.DataFrame) -> _pd.DataFrame:
        tbx = int(pdf["tbx"].iloc[0])
        tby = int(pdf["tby"].iloc[0])
        dw = min(bs, width - tbx * bs)
        dh = min(bs, height - tby * bs)
        pad = np.full((dh + 1, dw + 1), np.nan)
        x0g, y0g = tbx * bs, tby * bs
        for _, r in pdf.iterrows():
            arr = np.asarray(r["block"], dtype=np.float64).reshape(r["h"], r["w"])
            bx0, by0 = r["bx"] * bs, r["by"] * bs
            ix0, iy0 = max(bx0, x0g), max(by0, y0g)
            ix1 = min(bx0 + r["w"], x0g + dw + 1)
            iy1 = min(by0 + r["h"], y0g + dh + 1)
            if ix1 <= ix0 or iy1 <= iy0:
                continue
            pad[iy0 - y0g : iy1 - y0g, ix0 - x0g : ix1 - x0g] = arr[
                iy0 - by0 : iy1 - by0, ix0 - bx0 : ix1 - bx0
            ]
        counts: dict = {}
        fwd: dict = {}
        h, w = pad.shape
        for y in range(h - 1):
            for x in range(w - 1):
                zul, zur = pad[y, x], pad[y, x + 1]
                zll, zlr = pad[y + 1, x], pad[y + 1, x + 1]
                if np.isnan(zul) or np.isnan(zur) or np.isnan(zll) or np.isnan(zlr):
                    continue
                gx, gy = x + x0g + 0.5, y + y0g + 0.5
                for band, piece in split_square_bands(
                    zul, zur, zll, zlr, levels, gx, gy
                ):
                    pts = [
                        (round(px, 9), round(py, 9)) for px, py in piece
                    ]
                    n = len(pts)
                    for i in range(n):
                        a, b = pts[i], pts[(i + 1) % n]
                        if a == b:
                            continue
                        key = (band, a, b) if a <= b else (band, b, a)
                        counts[key] = counts.get(key, 0) + 1
                        fwd[key] = a <= b
        rows = []
        for key, c in counts.items():
            if c == 1:
                band, lo, hi = key
                a, b = (lo, hi) if fwd[key] else (hi, lo)
                rows.append((band, a[0], a[1], b[0], b[1]))
        return _pd.DataFrame(
            rows, columns=["band", "ax", "ay", "bx2", "by2"]
        )

    edges = contrib.groupBy("tbx", "tby").applyInPandas(
        emit_edges,
        "band int, ax double, ay double, bx2 double, by2 double",
    )
    lo_first = (F.col("ax") < F.col("bx2")) | (
        (F.col("ax") == F.col("bx2")) & (F.col("ay") <= F.col("by2"))
    )
    keyed = edges.select(
        "band",
        F.when(lo_first, F.col("ax")).otherwise(F.col("bx2")).alias("kx1"),
        F.when(lo_first, F.col("ay")).otherwise(F.col("by2")).alias("ky1"),
        F.when(lo_first, F.col("bx2")).otherwise(F.col("ax")).alias("kx2"),
        F.when(lo_first, F.col("by2")).otherwise(F.col("ay")).alias("ky2"),
        lo_first.cast("int").alias("fwd"),
    )
    survivors = (
        keyed.groupBy("band", "kx1", "ky1", "kx2", "ky2")
        .agg(F.count(F.lit(1)).alias("n"), F.first("fwd").alias("fwd"))
        .filter(F.col("n") == 1)
    )

    det = gt[1] * gt[5] - gt[2] * gt[4]

    def assemble(pdf: _pd.DataFrame) -> _pd.DataFrame:
        band = int(pdf["band"].iloc[0])
        eds = []
        for kx1, ky1, kx2, ky2, f in zip(
            pdf["kx1"], pdf["ky1"], pdf["kx2"], pdf["ky2"], pdf["fwd"]
        ):
            a, b = (kx1, ky1), (kx2, ky2)
            eds.append((a, b) if f else (b, a))
        rings = chain_rings(eds)
        outers, holes = [], []
        for r in rings:
            area2 = 0.0
            for (x1, y1), (x2, y2) in zip(r, r[1:]):
                area2 += x1 * y2 - x2 * y1
            (outers if area2 > 0 else holes).append((r, abs(area2) / 2.0))
        polys = [[r] for r, _ in sorted(outers, key=lambda t: -t[1])]
        outer_areas = sorted((a for _, a in outers), reverse=True)
        area_px = sum(outer_areas)
        for hr, ha in holes:
            area_px -= ha
            cands = [
                (a, i)
                for i, ((orr, a), _) in enumerate(
                    zip(sorted(outers, key=lambda t: -t[1]), polys)
                )
                if _in_ring(hr[0], orr)
            ]
            if cands:
                polys[min(cands)[1]].append(hr)
        geo_polys = []
        for rings_ in polys:
            geo_rings = []
            for j, r in enumerate(rings_):
                # canonical start/orientation + collinear cleanup so the
                # emitted WKB is independent of edge arrival order
                r = _canon_ring(r[:-1], ccw=(j == 0))
                pts = [
                    (
                        gt[0] + px * gt[1] + py * gt[2],
                        gt[3] + px * gt[4] + py * gt[5],
                    )
                    for px, py in r
                ]
                if det < 0:
                    pts = pts[::-1]
                geo_rings.append(pts)
            geo_polys.append(geo_rings)
        wkb_out = (
            None
            if not geo_polys
            else (
                _W.polygon_wkb(geo_polys[0])
                if len(geo_polys) == 1
                else _W.multipolygon_wkb(geo_polys)
            )
        )
        return _pd.DataFrame(
            {
                "band": [band],
                "n_polys": [len(polys)],
                "n_rings": [sum(len(p) for p in polys)],
                "area": [area_px * abs(det)],
                "geometry": [wkb_out],
            }
        )

    return survivors.groupBy("band").applyInPandas(
        assemble,
        "band int, n_polys int, n_rings int, area double, geometry binary",
    )
