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
        # square classification, vectorized: a square needs the python
        # chord cutter ONLY if some level lies within its corner range —
        # that set is O(contour length x levels), not O(area). Uniform
        # squares emit their 4 edges in bulk numpy; cancellation of the
        # combined edge set happens once via np.unique.
        ul = pad[:-1, :-1]
        ur = pad[:-1, 1:]
        ll = pad[1:, :-1]
        lr = pad[1:, 1:]
        valid = ~(np.isnan(ul) | np.isnan(ur) | np.isnan(ll) | np.isnan(lr))
        zmin = np.minimum(np.minimum(ul, ur), np.minimum(ll, lr))
        zmax = np.maximum(np.maximum(ul, ur), np.maximum(ll, lr))
        crossing = np.zeros_like(valid)
        for lv in levels:
            crossing |= (zmin <= lv) & (lv <= zmax)
        uniform = valid & ~crossing
        crossing &= valid

        # uniform squares: band from any corner (all corners same band)
        uy, ux = np.nonzero(uniform)
        uband = np.zeros(len(ux), dtype=np.int64)
        for lv in levels:
            uband += (ul[uy, ux] > lv).astype(np.int64)
        gx0 = ux + x0g + 0.5
        gy0 = uy + y0g + 0.5
        # 4 CCW edges per square: (x0,y0)->(x1,y0)->(x1,y1)->(x0,y1)->
        es = []
        for (ax, ay, bx, by) in (
            (0.0, 0.0, 1.0, 0.0),
            (1.0, 0.0, 1.0, 1.0),
            (1.0, 1.0, 0.0, 1.0),
            (0.0, 1.0, 0.0, 0.0),
        ):
            es.append(
                np.column_stack(
                    [uband, gx0 + ax, gy0 + ay, gx0 + bx, gy0 + by]
                )
            )
        bulk = (
            np.concatenate(es)
            if es and len(ux)
            else np.empty((0, 5), dtype=np.float64)
        )

        rows_py = []
        for y, x in zip(*np.nonzero(crossing)):
            gx, gy = x + x0g + 0.5, y + y0g + 0.5
            for band, piece in split_square_bands(
                pad[y, x], pad[y, x + 1], pad[y + 1, x], pad[y + 1, x + 1],
                levels, gx, gy,
            ):
                pts = [(round(px, 9), round(py, 9)) for px, py in piece]
                n = len(pts)
                for i in range(n):
                    a, b = pts[i], pts[(i + 1) % n]
                    if a != b:
                        rows_py.append((band, a[0], a[1], b[0], b[1]))
        all_edges = (
            np.concatenate(
                [bulk, np.asarray(rows_py, dtype=np.float64).reshape(-1, 5)]
            )
            if rows_py
            else bulk
        )
        if len(all_edges) == 0:
            return _pd.DataFrame(
                {"band": _pd.Series(dtype="int32"),
                 "ax": _pd.Series(dtype="float64"),
                 "ay": _pd.Series(dtype="float64"),
                 "bx2": _pd.Series(dtype="float64"),
                 "by2": _pd.Series(dtype="float64")}
            )
        # canonicalize (lexicographic endpoint order) + single np.unique
        # cancellation; count==1 survivors reconstruct their direction
        a_pts = all_edges[:, 1:3]
        b_pts = all_edges[:, 3:5]
        swap = (a_pts[:, 0] > b_pts[:, 0]) | (
            (a_pts[:, 0] == b_pts[:, 0]) & (a_pts[:, 1] > b_pts[:, 1])
        )
        lo = np.where(swap[:, None], b_pts, a_pts)
        hi = np.where(swap[:, None], a_pts, b_pts)
        keyed = np.column_stack([all_edges[:, 0], lo, hi, (~swap).astype(np.float64)])
        uniq, idx, counts_ = np.unique(
            keyed[:, :5], axis=0, return_index=True, return_counts=True
        )
        singles = counts_ == 1
        sel = keyed[idx[singles]]
        fwd_m = sel[:, 5] > 0.5
        ax_ = np.where(fwd_m, sel[:, 1], sel[:, 3])
        ay_ = np.where(fwd_m, sel[:, 2], sel[:, 4])
        bx_ = np.where(fwd_m, sel[:, 3], sel[:, 1])
        by_ = np.where(fwd_m, sel[:, 4], sel[:, 2])
        return _pd.DataFrame(
            {
                "band": sel[:, 0].astype(np.int32),
                "ax": ax_, "ay": ay_, "bx2": bx_, "by2": by_,
            }
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
