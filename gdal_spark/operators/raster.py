"""Distributed raster model + warp/stats operators.

Raster = DataFrame of blocks (SURVEY.md §1.1): one row per block
(bx, by, block: array<double> row-major, w, h actual block size) plus a
RasterMeta carrying (width, height, geotransform, crs, block size,
nodata) — the GDALDataset/GDALRasterBand split re-expressed for Spark.

Warp (gdalwarp re-expression, SURVEY.md §2.9):
  1. coalesce g x g adjacent dst blocks into gather groups (adjacent
     blocks share most of their src windows — the union window cuts the
     src-block shuffle fan-out ~2.5x);
  2. per group, compute the needed src window with closed-form corner
     transforms (ComputeSourceWindow analogue,
     /root/reference/alg/gdalwarpoperation.cpp) — driver-side for small
     grids, a pandas_udf over a range skeleton beyond 65536 groups;
  3. equi-join src blocks on (sbx, sby) — the tiny need side broadcasts,
     so the only exchange is the groupBy hash partitioning;
  4. groupBy group + applyInPandas: assemble the shared src mosaic once,
     run the reference-exact numpy kernel (kernels/warp.py) per member
     dst block.

Chunking ≡ partitioning: the reference's ChunkAndWarpImage memory-budget
recursion (gdalwarpoperation.cpp:1019) maps to block size choice; its
-multi IO/compute overlap maps to Spark task pipelining.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import warp as WK
from ..kernels.checksum import checksum as _checksum


@dataclass(frozen=True)
class RasterMeta:
    width: int
    height: int
    gt: tuple  # 6-coeff affine, gcore/gdal_priv.h:932
    crs: str
    block: int = 256
    nodata: float = 0.0

    @property
    def nbx(self) -> int:
        return -(-self.width // self.block)

    @property
    def nby(self) -> int:
        return -(-self.height // self.block)


def raster_from_array(spark: SparkSession, arr: np.ndarray, gt, crs, block: int = 256,
                      nodata: float = 0.0):
    """Driver-side array -> (blocks DataFrame, RasterMeta). Test/fixture
    path; production rasters arrive as block tables already. Routed
    through session.local_df so the fixture plans as a LocalRelation,
    not a pickled-RDD scan re-evaluated per consumer."""
    from ..session import local_df

    h, w = arr.shape
    meta = RasterMeta(w, h, tuple(float(g) for g in gt), crs, block, nodata)
    rows = []
    for by in range(meta.nby):
        for bx in range(meta.nbx):
            sub = arr[by * block : (by + 1) * block, bx * block : (bx + 1) * block]
            rows.append(
                (bx, by, int(sub.shape[1]), int(sub.shape[0]),
                 np.ascontiguousarray(sub, dtype=np.float64).ravel())
            )
    df = local_df(
        spark, rows, "bx int, by int, w int, h int, block array<double>"
    )
    return df, meta


# --- block transport formats -------------------------------------------
#
# Two block representations, one semantics:
#   array<double> — the SQL-interop form: posexplode to pixels, JVM
#     higher-order-function math (rastermath scale/reclassify), oracle
#     queries. Costs Arrow list offsets + per-element handling in every
#     Python transfer.
#   binary (packed little-endian float64, row-major) — the scale form:
#     one contiguous buffer per block, zero boxing, ~2x faster Arrow
#     transport measured on the 2048^2 bench. This is what a 100 TB
#     block table should store in parquet.
# warp/stats kernels auto-detect the form from the schema; pack/unpack
# convert between them.


def _is_packed(blocks: DataFrame) -> bool:
    from pyspark.sql.types import BinaryType

    return isinstance(blocks.schema["block"].dataType, BinaryType)


def pack_blocks(blocks: DataFrame, dtype: str = "<f8") -> DataFrame:
    """array<double> block table -> packed binary block table.

    dtype is the TRANSPORT type (little-endian numpy code: '<f8', '<f4',
    '<i2', 'u1' — the GDAL Float64/Float32/Int16/Byte ladder): a Byte
    raster packed as u1 ships 8x fewer bytes through every shuffle and
    Arrow transfer than float64, which is the difference on a
    bandwidth-bound stage like warp (gcore stores native dtype blocks
    for the same reason). Kernels always COMPUTE in float64; the payload
    is self-describing (bytes-per-pixel = len/(w*h)), so no schema or
    metadata change is needed anywhere downstream."""

    def conv(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["block"] = [
                np.ascontiguousarray(b, dtype=dtype).tobytes()
                for b in pdf["block"]
            ]
            yield pdf

    return blocks.mapInPandas(
        conv, "bx int, by int, w int, h int, block binary"
    )


def unpack_blocks(blocks: DataFrame) -> DataFrame:
    """packed binary block table (any transport dtype) -> array<double>
    block table."""

    def conv(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["block"] = [
                _block_np(b, int(h), int(w)).ravel()
                for b, w, h in zip(pdf["block"], pdf["w"], pdf["h"])
            ]
            yield pdf

    return blocks.mapInPandas(
        conv, "bx int, by int, w int, h int, block array<double>"
    )


_PACKED_DTYPES = {8: "<f8", 4: "<f4", 2: "<i2", 1: "u1"}


def _pack_payload(arr: np.ndarray, dtype: str) -> bytes:
    """float64 kernel output -> packed payload in the transport dtype.
    Integer transports use GDALCopyWords' float->int rule (round to
    nearest via floor(v + 0.5), clamp to the type range;
    gcore/rasterio.cpp GDALCopyWords float specializations)."""
    if dtype in ("<f8", "<f4"):
        return np.ascontiguousarray(arr, dtype=dtype).tobytes()
    info = np.iinfo(np.dtype(dtype))
    q = np.clip(np.floor(arr + 0.5), info.min, info.max)
    return np.ascontiguousarray(q, dtype=dtype).tobytes()


def _block_np(blk, h: int, w: int) -> np.ndarray:
    """One block payload (either form) -> (h, w) float64 array. Packed
    payloads are self-describing by bytes-per-pixel (f8/f4/i2/u1)."""
    if isinstance(blk, (bytes, bytearray, memoryview)):
        bpp = len(blk) // (h * w)
        arr = np.frombuffer(blk, dtype=_PACKED_DTYPES[bpp]).reshape(h, w)
        return arr if bpp == 8 else arr.astype(np.float64)
    return np.asarray(blk, dtype=np.float64).reshape(h, w)


def synthetic_raster(
    spark: SparkSession, meta: RasterMeta, packed: bool = False,
    dtype: str = "<f8",
) -> DataFrame:
    """Executor-side deterministic raster: value = (row*7 + col*13) % 256
    (byte-range, GDT_Byte-like — the reference warp bench shape). Blocks
    generate in parallel from spark.range, no driver data. packed=True
    emits the binary block form (the scale path); dtype picks the packed
    transport type (see pack_blocks — 'u1' is the faithful GDT_Byte
    shape and ships 8x fewer bytes)."""
    nbx, block = meta.nbx, meta.block
    width, height = meta.width, meta.height

    def gen(it):
        import pandas as pd  # noqa: F811

        for pdf in it:
            rows = []
            for bid in pdf["id"]:
                bx, by = int(bid) % nbx, int(bid) // nbx
                w = min(block, width - bx * block)
                h = min(block, height - by * block)
                jj, ii = np.meshgrid(
                    np.arange(by * block, by * block + h),
                    np.arange(bx * block, bx * block + w),
                    indexing="ij",
                )
                arr = ((jj * 7 + ii * 13) % 256).astype(np.float64)
                rows.append(
                    (
                        bx, by, w, h,
                        np.ascontiguousarray(arr, dtype=dtype).tobytes()
                        if packed
                        else arr.ravel(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["bx", "by", "w", "h", "block"]
            )

    out_type = "bx int, by int, w int, h int, block " + (
        "binary" if packed else "array<double>"
    )
    return spark.range(meta.nbx * meta.nby).mapInPandas(gen, out_type)


def raster_to_array(blocks: DataFrame, meta: RasterMeta) -> np.ndarray:
    """Collect a (small) raster back to a driver array (tests/goldens)."""
    out = np.full((meta.height, meta.width), meta.nodata, dtype=np.float64)
    for r in blocks.collect():
        x0, y0 = r["bx"] * meta.block, r["by"] * meta.block
        out[y0 : y0 + r["h"], x0 : x0 + r["w"]] = _block_np(
            r["block"], r["h"], r["w"]
        )
    return out


# LRU cache of collected mosaic broadcasts. Bounded: each entry can pin
# up to SPARK_GRAFT_WARP_BCAST_MAX (256 MB default) on driver + executors,
# so evicted entries are unpersist()ed (executor copies freed; the driver
# can re-ship if a stale lazy plan re-executes — unlike destroy(), this
# can't break a not-yet-run DataFrame that closed over the broadcast).
# Keyed on (applicationId, plan semanticHash, shape): semanticHash does
# NOT see external data changes, so a source table mutated in place under
# the same plan must bump `cache_version` to avoid stale pixels.
from collections import OrderedDict

_WARP_BCAST: OrderedDict = OrderedDict()
_WARP_BCAST_MAX_ENTRIES = 4


def _warp_broadcast(
    src_blocks: DataFrame, src: RasterMeta, dst: RasterMeta,
    resampling: str, packed: bool, cache_version: object = None,
) -> DataFrame:
    """Small-raster gather: collect the block table once, broadcast the
    NATIVE-dtype mosaic, and compute every dst block straight from it in
    ONE mapInPandas over a range skeleton — zero joins, zero shuffles,
    no duplicate block transport (the grouped-shuffle path ships each
    src block to ~2.3 gather groups).  The kernels' fancy gathers touch
    only the elements they need, so no per-task slice/cast is paid; u1
    mosaics stay 1 byte/px end-to-end.  Gated by total raster bytes —
    the exact small-side-broadcast discipline of a broadcast join; big
    rasters keep the grouped-shuffle path."""
    spark = src_blocks.sparkSession
    bs = dst.block
    sbs = src.block
    src_gt, dst_gt = src.gt, dst.gt
    src_crs, dst_crs = src.crs, dst.crs
    src_w, src_h = src.width, src.height
    nbx_dst, nby_dst = dst.nbx, dst.nby
    nodata = dst.nodata

    # The mosaic broadcast is cached per (application, source plan):
    # repeated warps of the same block table (multi-resampler runs,
    # benchmark reps) pay collect+broadcast once.  Same immutability
    # assumption as .persist() — a source table mutated under the same
    # plan must pass a new `cache_version`.
    key = (
        spark.sparkContext.applicationId,
        src_blocks.semanticHash(),
        (src.width, src.height, src.block),
        cache_version,
    )
    for stale in [k for k in _WARP_BCAST if k[0] != key[0]]:
        old, _ = _WARP_BCAST.pop(stale)
        old.unpersist(blocking=False)
    cached = _WARP_BCAST.get(key)
    if cached is not None:
        _WARP_BCAST.move_to_end(key)
        bcast, tdt = cached
    else:
        rows = src_blocks.select("bx", "by", "w", "h", "block").collect()
        tdt = "<f8"
        if packed and rows:
            r0 = rows[0]
            tdt = _PACKED_DTYPES[
                len(r0["block"]) // (int(r0["h"]) * int(r0["w"]))
            ]
        # native-dtype mosaic when the dtype holds nodata exactly (the
        # shuffle path prefills missing cells with float64 nodata — match)
        mdt = np.dtype(tdt if tdt != "<f8" else np.float64)
        if float(np.array(nodata).astype(mdt)) != float(nodata):
            mdt = np.dtype(np.float64)
        mosaic = np.full((src_h, src_w), nodata, dtype=mdt)
        for r in rows:
            x0, y0 = int(r["bx"]) * sbs, int(r["by"]) * sbs
            h, w = int(r["h"]), int(r["w"])
            blk = r["block"]
            if isinstance(blk, (bytes, bytearray, memoryview)):
                bpp = len(blk) // (h * w)
                arr = np.frombuffer(
                    blk, dtype=_PACKED_DTYPES[bpp]
                ).reshape(h, w)
            else:
                arr = np.asarray(blk, dtype=np.float64).reshape(h, w)
            mosaic[y0 : y0 + h, x0 : x0 + w] = arr
        bcast = spark.sparkContext.broadcast(mosaic)
        _WARP_BCAST[key] = (bcast, tdt)
        while len(_WARP_BCAST) > _WARP_BCAST_MAX_ENTRIES:
            _, (old, _t) = _WARP_BCAST.popitem(last=False)
            old.unpersist(blocking=False)

    def warp_bcast(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mos = bcast.value
        for pdf in it:
            out_rows: dict = {"bx": [], "by": [], "w": [], "h": [], "block": []}
            for bid in pdf["id"]:
                dbx, dby = int(bid) % nbx_dst, int(bid) // nbx_dst
                dw = min(bs, dst.width - dbx * bs)
                dh = min(bs, dst.height - dby * bs)
                dst_block_gt = (
                    dst_gt[0] + dbx * bs * dst_gt[1], dst_gt[1], dst_gt[2],
                    dst_gt[3] + dby * bs * dst_gt[5], dst_gt[4], dst_gt[5],
                )
                out = WK.warp_block(
                    mos, src_gt, src_crs, (dh, dw), dst_block_gt, dst_crs,
                    resampling, nodata, src_x0=0, src_y0=0,
                    src_total_w=src_w, src_total_h=src_h,
                )
                out_rows["bx"].append(dbx)
                out_rows["by"].append(dby)
                out_rows["w"].append(dw)
                out_rows["h"].append(dh)
                out_rows["block"].append(
                    _pack_payload(out, tdt) if packed else out.ravel()
                )
            yield pd.DataFrame(out_rows)

    block_ddl = "bx int, by int, w int, h int, block " + (
        "binary" if packed else "array<double>"
    )
    n = nbx_dst * nby_dst
    par = min(n, spark.sparkContext.defaultParallelism)
    return spark.range(0, n, numPartitions=par).mapInPandas(
        warp_bcast, block_ddl
    )


def warp(
    src_blocks: DataFrame,
    src: RasterMeta,
    dst: RasterMeta,
    resampling: str = "near",
    group_factor: int | None = None,
    gather: str = "auto",
    cache_version: object = None,
) -> DataFrame:
    """Warp a block raster onto the dst grid. Returns dst block rows in
    the same block form (array<double> or packed binary) as the input.

    cache_version: opaque token mixed into the broadcast-mosaic cache
    key — bump it when the source table's DATA changed under an
    unchanged plan (the cache can't see external mutation).

    group_factor g coalesces g x g adjacent dst blocks into one gather
    group: adjacent dst blocks share most of their src windows, so the
    union window ships each src block to far fewer groups (measured
    fan-out 5.8 -> 2.3 per src block at 2048^2 with g=2) and one python
    call warps all members off the shared mosaic. Results are
    byte-identical: each member block still runs the same kernel against
    the same (nodata-prefilled, raster-extent-clamped) window. Default:
    2 when the dst grid is at least 4x4 blocks, else 1."""
    spark = src_blocks.sparkSession
    packed = _is_packed(src_blocks)

    if gather == "auto":
        import os as _os

        limit = int(
            _os.environ.get("SPARK_GRAFT_WARP_BCAST_MAX", str(256 << 20))
        )
        gather = (
            "broadcast" if src.width * src.height * 8 <= limit else "shuffle"
        )
    if gather == "broadcast":
        return _warp_broadcast(
            src_blocks, src, dst, resampling, packed, cache_version
        )

    bs, sbs = dst.block, src.block
    src_gt, dst_gt = src.gt, dst.gt
    src_crs, dst_crs = src.crs, dst.crs
    src_w, src_h = src.width, src.height
    nbx_src, nby_src = src.nbx, src.nby
    nbx_dst, nby_dst = dst.nbx, dst.nby
    nodata = dst.nodata
    if group_factor is None:
        group_factor = 2 if min(nbx_dst, nby_dst) >= 4 else 1
    g = max(int(group_factor), 1)
    ngx, ngy = -(-nbx_dst // g), -(-nby_dst // g)

    def _window_blocks(x: int, y: int):
        dw = min(bs, dst.width - x * bs)
        dh = min(bs, dst.height - y * bs)
        wx0, wy0, ww, wh = WK.src_window_for_dst_block(
            x * bs, y * bs, dw, dh, dst_gt, dst_crs, src_gt, src_crs
        )
        wx0c, wy0c = max(wx0, 0), max(wy0, 0)
        wx1 = min(wx0 + ww, src_w)
        wy1 = min(wy0 + wh, src_h)
        if wx1 <= wx0c or wy1 <= wy0c:
            return []
        return [
            (sbx, sby)
            for sby in range(wy0c // sbs, min((wy1 - 1) // sbs, nby_src - 1) + 1)
            for sbx in range(wx0c // sbs, min((wx1 - 1) // sbs, nbx_src - 1) + 1)
        ]

    def _group_blocks(X: int, Y: int):
        out: set = set()
        for y in range(Y * g, min((Y + 1) * g, nby_dst)):
            for x in range(X * g, min((X + 1) * g, nbx_dst)):
                out.update(_window_blocks(x, y))
        return sorted(out)

    n_groups = ngx * ngy
    if n_groups <= 65536:
        # the group skeleton is metadata, not data: the
        # ComputeSourceWindow analogue is a few transforms per dst BLOCK
        # — driver-side math, no python-worker stage (same fast-path
        # rationale as the zone compiles in pip_join)
        from ..session import local_df

        rows = [
            (X, Y, sbx, sby)
            for Y in range(ngy)
            for X in range(ngx)
            for sbx, sby in _group_blocks(X, Y)
        ]
        need = local_df(spark, rows, "gx int, gy int, bx int, by int")
        full_cover = len({(X, Y) for X, Y, _, _ in rows}) == n_groups
    else:
        full_cover = False

        @F.pandas_udf("array<struct<sbx:int,sby:int>>")
        def needed_blocks(gx: pd.Series, gy: pd.Series) -> pd.Series:
            out = []
            for X, Y in zip(gx, gy):
                out.append(
                    [{"sbx": sbx, "sby": sby} for sbx, sby in _group_blocks(X, Y)]
                )
            return pd.Series(out)

        gskel = (
            spark.range(n_groups)
            .select(
                (F.col("id") % ngx).cast("int").alias("gx"),
                (F.col("id") / ngx).cast("int").alias("gy"),
            )
        )
        need = (
            gskel.withColumn("nb", needed_blocks(F.col("gx"), F.col("gy")))
            .select("gx", "gy", F.explode("nb").alias("nb"))
            .select(
                "gx", "gy", F.col("nb.sbx").alias("bx"), F.col("nb.sby").alias("by")
            )
        )
    joined = need.join(src_blocks, ["bx", "by"], "inner")

    def warp_group(pdf: pd.DataFrame) -> pd.DataFrame:
        gx = int(pdf["gx"].iloc[0])
        gy = int(pdf["gy"].iloc[0])
        # mosaic the gathered src blocks into one shared window array
        x0 = int(pdf["bx"].min()) * sbs
        y0 = int(pdf["by"].min()) * sbs
        # clamp to the raster extent: past-the-edge mosaic cells would read
        # as in-bounds nodata and corrupt bilinear edge renormalization
        x1 = min(int((pdf["bx"].max() + 1) * sbs), src_w)
        y1 = min(int((pdf["by"].max() + 1) * sbs), src_h)
        mosaic = np.full((y1 - y0, x1 - x0), nodata, dtype=np.float64)
        tdt = "<f8"  # output transport follows the input blocks' dtype
        for sbx, sby, sw, sh, blk in zip(
            pdf["bx"], pdf["by"], pdf["w"], pdf["h"], pdf["block"]
        ):
            ox, oy = sbx * sbs - x0, sby * sbs - y0
            mosaic[oy : oy + sh, ox : ox + sw] = _block_np(blk, sh, sw)
            if packed:
                tdt = _PACKED_DTYPES[len(blk) // (int(sh) * int(sw))]
        out_rows: dict = {"bx": [], "by": [], "w": [], "h": [], "block": []}
        for dby in range(gy * g, min((gy + 1) * g, nby_dst)):
            for dbx in range(gx * g, min((gx + 1) * g, nbx_dst)):
                dw = min(bs, dst.width - dbx * bs)
                dh = min(bs, dst.height - dby * bs)
                dst_block_gt = (
                    dst_gt[0] + dbx * bs * dst_gt[1],
                    dst_gt[1],
                    dst_gt[2],
                    dst_gt[3] + dby * bs * dst_gt[5],
                    dst_gt[4],
                    dst_gt[5],
                )
                out = WK.warp_block(
                    mosaic, src_gt, src_crs, (dh, dw), dst_block_gt, dst_crs,
                    resampling, nodata, src_x0=x0, src_y0=y0,
                    src_total_w=src_w, src_total_h=src_h,
                )
                out_rows["bx"].append(dbx)
                out_rows["by"].append(dby)
                out_rows["w"].append(dw)
                out_rows["h"].append(dh)
                out_rows["block"].append(
                    _pack_payload(out, tdt) if packed else out.ravel()
                )
        return pd.DataFrame(out_rows)

    block_ddl = "bx int, by int, w int, h int, block " + (
        "binary" if packed else "array<double>"
    )
    warped = joined.groupBy("gx", "gy").applyInPandas(warp_group, block_ddl)
    if full_cover:
        # every group has src coverage: warp_group emits every member dst
        # block (nodata-masked where its own window is empty), so no
        # fill branch is needed
        return warped
    # dst blocks of groups with no src coverage at all still exist in the
    # output raster, filled with nodata (gdalwarp initializes the full
    # dst extent). Coverage is decided from `need` (every needed key
    # matches a src block, so it equals the warp output keys) —
    # anti-joining against `warped` itself would re-execute the warp UDF
    # a second time just to learn which keys exist.
    gskel_all = spark.range(n_groups).select(
        (F.col("id") % ngx).cast("int").alias("gx"),
        (F.col("id") / ngx).cast("int").alias("gy"),
    )
    empty_skel = (
        gskel_all.join(
            need.select("gx", "gy").distinct(),
            ["gx", "gy"],
            "left_anti",
        )
        .select(
            F.explode(
                F.sequence(
                    F.col("gx") * g,
                    F.least(F.col("gx") * g + (g - 1), F.lit(nbx_dst - 1)),
                )
            ).alias("bx"),
            "gy",
        )
        .select(
            "bx",
            F.explode(
                F.sequence(
                    F.col("gy") * g,
                    F.least(F.col("gy") * g + (g - 1), F.lit(nby_dst - 1)),
                )
            ).alias("by"),
        )
        .select(
            "bx",
            "by",
            F.least(F.lit(bs), F.lit(dst.width) - F.col("bx") * bs)
            .cast("int")
            .alias("w"),
            F.least(F.lit(bs), F.lit(dst.height) - F.col("by") * bs)
            .cast("int")
            .alias("h"),
        )
    )
    if packed:

        def fill(it):
            for pdf in it:
                pdf = pdf.copy()
                pdf["block"] = [
                    np.full(int(w) * int(h), nodata, dtype="<f8").tobytes()
                    for w, h in zip(pdf["w"], pdf["h"])
                ]
                yield pdf

        empty = empty_skel.mapInPandas(fill, block_ddl)
    else:
        empty = empty_skel.withColumn(
            "block",
            F.array_repeat(F.lit(float(nodata)), F.col("w") * F.col("h")),
        )
    return warped.unionByName(empty)


def resize(
    src_blocks: DataFrame,
    src: RasterMeta,
    out_w: int,
    out_h: int,
    resampling: str = "near",
):
    """`gdal raster resize` (apps/gdalalg_raster_resize.cpp): same
    extent and CRS, new pixel grid — exactly a warp onto the scaled
    geotransform, so all 14 resamplers apply. Returns (blocks, meta)."""
    g = src.gt
    dst = RasterMeta(
        out_w,
        out_h,
        (
            g[0], g[1] * src.width / out_w, g[2],
            g[3], g[4], g[5] * src.height / out_h,
        ),
        src.crs,
        src.block,
        src.nodata,
    )
    return warp(src_blocks, src, dst, resampling), dst


from pyspark.sql.types import StringType as _StringType


@F.pandas_udf(_StringType())
def wkt_of(geom: pd.Series) -> pd.Series:
    """WKB -> WKT (OGR_GEOM_WKT special field, ogr/ogr_p.h:171) via the
    numpy codec (kernels/wkb.py, ogrgeometry.cpp:1983 exportToWkt)."""
    from ..kernels import wkb as _W

    return pd.Series([None if b is None else _W.wkt(bytes(b)) for b in geom])


from pyspark.sql.types import (  # noqa: E402
    DoubleType as _DoubleType,
    StructField as _StructField,
    StructType as _StructType,
)

_CENTROID_TYPE = _StructType(
    [_StructField("cx", _DoubleType()), _StructField("cy", _DoubleType())]
)


@F.pandas_udf(_CENTROID_TYPE)
def centroid_of(geom: pd.Series) -> pd.DataFrame:
    """WKB -> area-weighted centroid (OGRGeometry::Centroid,
    ogrgeometry.cpp:6108) via kernels/wkb.centroid."""
    from ..kernels import wkb as _W

    cx, cy = [], []
    for b in geom:
        if b is None:
            cx.append(None)
            cy.append(None)
        else:
            x, y = _W.centroid(bytes(b))
            cx.append(x)
            cy.append(y)
    return pd.DataFrame({"cx": cx, "cy": cy})


def raster_stats(blocks: DataFrame) -> DataFrame:
    """min/max/mean/stddev over all pixels (ComputeStatistics semantics,
    /root/reference/gcore/gdalrasterband.cpp:6478 exact mode) — one
    explode-free aggregation via higher-order functions + final combine."""
    per_block = blocks.select(
        F.expr("aggregate(block, CAST(0 AS DOUBLE), (a, x) -> a + x)").alias("s"),
        F.expr("aggregate(block, CAST(0 AS DOUBLE), (a, x) -> a + x * x)").alias("s2"),
        F.expr("array_min(block)").alias("mn"),
        F.expr("array_max(block)").alias("mx"),
        F.expr("size(block)").alias("n"),
    )
    return per_block.agg(
        F.min("mn").alias("min"),
        F.max("mx").alias("max"),
        (F.sum("s") / F.sum("n")).alias("mean"),
        F.sqrt(F.sum("s2") / F.sum("n") - F.pow(F.sum("s") / F.sum("n"), 2)).alias(
            "stddev"
        ),
        F.sum("n").alias("n_pixels"),
    )


def raster_checksum(blocks: DataFrame, meta: RasterMeta) -> int:
    """GDALChecksumImage parity (/root/reference/alg/gdalchecksum.cpp:48).

    The checksum is defined over row-major pixel order of the full raster,
    so blocks are re-assembled; suitable for golden checks on test-sized
    rasters (the reference's own checksum goldens are 20x20..1024x1024)."""
    return int(_checksum(raster_to_array(blocks, meta)))


def apply_cutline(blocks: DataFrame, meta: RasterMeta, cutline_wkb: bytes) -> DataFrame:
    """gdalwarp -cutline semantics (apps/gdalwarp_lib.cpp cutline ->
    validity mask, no -cblend): pixels whose CENTER lies outside the
    cutline (multi)polygon are set to the raster's nodata; everything
    else passes through. Per-block vectorized ray-cast
    (kernels/pip.points_in_wkb, the reference-exact rule) over the
    block's geo pixel centers — embarrassingly parallel, no shuffle,
    output in the input's block form."""
    from ..kernels import pip as PIP

    packed = _is_packed(blocks)
    gt = meta.gt
    bs = meta.block
    nodata = float(meta.nodata)
    cw = bytes(cutline_wkb)

    def mask(it):
        for pdf in it:
            pdf = pdf.copy()
            out = []
            for bx, by, w, h, blk in zip(
                pdf["bx"], pdf["by"], pdf["w"], pdf["h"], pdf["block"]
            ):
                arr = _block_np(blk, int(h), int(w)).copy()
                jj, ii = np.meshgrid(
                    np.arange(int(h)), np.arange(int(w)), indexing="ij"
                )
                px = bx * bs + ii + 0.5
                py = by * bs + jj + 0.5
                gx = gt[0] + px * gt[1] + py * gt[2]
                gy = gt[3] + px * gt[4] + py * gt[5]
                inside = PIP.points_in_wkb(gx.ravel(), gy.ravel(), cw)
                arr.ravel()[~inside] = nodata
                out.append(
                    np.ascontiguousarray(arr, dtype="<f8").tobytes()
                    if packed
                    else arr.ravel()
                )
            pdf["block"] = out
            yield pdf

    ddl = "bx int, by int, w int, h int, block " + (
        "binary" if packed else "array<double>"
    )
    return blocks.mapInPandas(mask, ddl)


def raster_srcwin(
    blocks: DataFrame, meta: RasterMeta, x0: int, y0: int, w: int, h: int
) -> tuple:
    """gdal_translate -srcwin: extract a pixel sub-window as a new
    raster (apps/gdal_translate_lib.cpp srcwin path). Expressed as a
    near warp with an identity mapping onto the shifted geotransform —
    integer offsets land every dst sample exactly on a src pixel center,
    so values are byte-exact copies; the gather plan prunes to only the
    source blocks the window touches. Returns (blocks, new_meta)."""
    gt = meta.gt
    dst_gt = (
        gt[0] + x0 * gt[1] + y0 * gt[2],
        gt[1], gt[2],
        gt[3] + x0 * gt[4] + y0 * gt[5],
        gt[4], gt[5],
    )
    dst = RasterMeta(w, h, dst_gt, meta.crs, meta.block, meta.nodata)
    return warp(blocks, meta, dst, "near"), dst


def raster_histogram(
    blocks: DataFrame,
    vmin: float,
    vmax: float,
    buckets: int,
    include_out_of_range: bool = False,
) -> DataFrame:
    """GDALRasterBand::GetHistogram (gcore/gdalrasterband.cpp:4133),
    exact (approx_ok=FALSE): `buckets` equal-width bins over
    [vmin, vmax); out-of-range pixels are dropped unless
    include_out_of_range, which clamps them into the end bins. One
    explode + hash aggregation — a single shuffle whose output is
    O(buckets)."""
    width = (vmax - vmin) / buckets
    v = F.explode("block").alias("v")
    df = blocks.select(v).select(F.col("v"))
    idx = F.floor((F.col("v") - F.lit(vmin)) / F.lit(width)).cast("int")
    if include_out_of_range:
        b = F.least(F.greatest(idx, F.lit(0)), F.lit(buckets - 1))
        df = df.select(b.alias("bucket"))
    else:
        df = df.filter(
            (F.col("v") >= vmin) & (F.col("v") < vmax)
        ).select(idx.alias("bucket"))
    return df.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
