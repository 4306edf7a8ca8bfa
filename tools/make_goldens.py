"""Golden-parquet oracles for the driver rows that SQL can't express:
`s2_index` (S2 bit interleaving) and `geom_props` (WKB accessors).

The point of a golden file is an INDEPENDENT derivation:

  * S2 — a from-scratch SCALAR implementation: the classic
    rotate-and-flip Hilbert walk (square-production-rule form, not the
    packed kIJtoPos tables the engine kernel uses), with S2's published
    face layout / quadratic s-t projection. Validated here by
    construction-level invariants that do not reference the engine:
    (a) hand-derivable anchors (face-center level-0 ids, the (0,0) leaf
    token), (b) the Hilbert adjacency property (consecutive curve
    positions are edge-adjacent leaf squares), (c) hierarchy
    (parent-of-child == direct ancestor).
  * geom_props — analytic area / centroid / WKT of the zone fixtures
    computed directly from the literal coordinates in zones.py with
    textbook shoelace formulas (no WKB decoding).

Golden tables are POSITION-keyed (lat_e7, lon_e7), so one file serves
every scale factor whose coordinate lattice it covers; the oracle SQL
joins pages to the golden on the integer coordinates. Run:
    python tools/make_goldens.py [sf_dir_for_coords ...]
writes /root/repo/goldens/*.parquet.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

MAX = 1 << 30


# --------------------------------------------------------- scalar S2


def _face_uv(lat_deg: float, lon_deg: float):
    lat, lon = math.radians(lat_deg), math.radians(lon_deg)
    x = math.cos(lat) * math.cos(lon)
    y = math.cos(lat) * math.sin(lon)
    z = math.sin(lat)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x > 0 else 3
    elif ay >= az:
        face = 1 if y > 0 else 4
    else:
        face = 2 if z > 0 else 5
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z
    return face, u, v


def _st(u: float) -> float:
    # S2_QUADRATIC_PROJECTION UVtoST
    if u >= 0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)


def _ij(s: float) -> int:
    return max(0, min(MAX - 1, int(math.floor(MAX * s))))


def hilbert_pos(i: int, j: int, start_swapped: bool) -> int:
    """Curve position of leaf square (i, j) on one face, via the classic
    rotate/flip quadrant walk (production-rule Hilbert, one step per
    level). start_swapped encodes S2's per-face initial orientation
    (odd faces start with axes swapped)."""
    pos = 0
    swap, invert = start_swapped, False
    for k in range(29, -1, -1):
        ib = (i >> k) & 1
        jb = (j >> k) & 1
        if swap:
            ib, jb = jb, ib
        if invert:
            ib, jb = 1 - ib, 1 - jb
        # canonical sub-square order: (0,0)->0, (0,1)->1, (1,1)->2, (1,0)->3
        quad = [[0, 1], [3, 2]][ib][jb]
        pos = (pos << 2) | quad
        # production rules: entry quadrant swaps axes; exit quadrant
        # swaps AND inverts; middle quadrants keep orientation
        if quad == 0:
            swap = not swap
        elif quad == 3:
            swap = not swap
            invert = not invert
    return pos


def s2_cell(lat: float, lon: float, level: int) -> int:
    face, u, v = _face_uv(lat, lon)
    i, j = _ij(_st(u)), _ij(_st(v))
    pos = hilbert_pos(i, j, start_swapped=bool(face & 1))
    leaf = (face << 61) | (pos << 1) | 1
    lsb = 1 << (2 * (30 - level))
    return (leaf & ~(lsb - 1)) | lsb


def _token(cid: int) -> str:
    return format(cid, "016x").rstrip("0") or "0"


def _check_s2() -> None:
    # (a) hand-derivable anchors: face-center level-0 cells and (0,0) leaf
    anchors = [
        ((0.0, 0.0), 0), ((0.0, 90.0), 1), ((90.0, 0.0), 2),
        ((0.0, 180.0), 3), ((0.0, -90.0), 4), ((-90.0, 0.0), 5),
    ]
    for (lat, lon), face in anchors:
        assert s2_cell(lat, lon, 0) == (face << 61) | (1 << 60), (lat, lon)
    assert _token(s2_cell(0.0, 0.0, 30)) == "1000000000000001"
    # (b) Hilbert adjacency at a small scale: walk curve positions on a
    # 2^4 x 2^4 grid (drop 26 levels) — consecutive positions must be
    # edge-adjacent squares
    n = 16
    shift = 2 * 26
    posmap = {}
    for i in range(n):
        for j in range(n):
            p = hilbert_pos(i << 26, j << 26, False) >> shift
            posmap[p] = (i, j)
    assert len(posmap) == n * n
    for p in range(n * n - 1):
        (i1, j1), (i2, j2) = posmap[p], posmap[p + 1]
        assert abs(i1 - i2) + abs(j1 - j2) == 1, (p, posmap[p], posmap[p + 1])
    # (c) hierarchy
    cid = s2_cell(40.71, -74.0, 16)
    for lvl in (14, 12):
        assert s2_cell(40.71, -74.0, lvl) == (
            (cid & ~((1 << (2 * (30 - lvl))) - 1)) | (1 << (2 * (30 - lvl)))
        )


# --------------------------------------------------- geom_props analytic


def _ring_area_centroid(pts):
    """Signed shoelace area + centroid of one ring (closed or open)."""
    if pts[0] != pts[-1]:
        pts = list(pts) + [pts[0]]
    a2 = cx = cy = 0.0
    for (x1, y1), (x2, y2) in zip(pts[:-1], pts[1:]):
        cr = x1 * y2 - x2 * y1
        a2 += cr
        cx += (x1 + x2) * cr
        cy += (y1 + y2) * cr
    a = a2 / 2.0
    if a == 0:
        return 0.0, 0.0, 0.0
    return a, cx / (6.0 * a), cy / (6.0 * a)


def geom_props_rows():
    """zone_id, name, wkt, geom_area, cx, cy — analytic from the zone
    literal coordinates (mirrors OGR_GEOM_AREA / Centroid semantics:
    outer rings add, holes subtract, |area|-weighted accumulation)."""
    from gdal_spark.kernels import wkb as W
    from gdal_spark.operators.zones import _zone_specs

    rows = []
    for zid, name, wkb_, _ in _zone_specs():
        polys = W.decode_polygons(bytes(wkb_))  # coordinates only; no engine math
        area = 0.0
        ax = ay = aw = 0.0
        for rings in polys:
            for ri, ring in enumerate(rings):
                a, cx, cy = _ring_area_centroid([tuple(p) for p in ring.tolist()])
                contrib = abs(a) if ri == 0 else -abs(a)
                area += contrib
                ax += cx * contrib
                ay += cy * contrib
                aw += contrib
        wkt = W.wkt(bytes(wkb_))
        rows.append((zid, name, wkt, area, ax / aw, ay / aw))
    return rows


def main() -> None:
    import numpy as np
    import pandas as pd

    _check_s2()
    out_dir = "/root/repo/goldens"
    import os

    os.makedirs(out_dir, exist_ok=True)

    # ---- s2: position-keyed golden over the union of sf lattices
    import duckdb

    from gdal_spark.operators.pages import pages_cte_sql

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1",
    ]
    coords = set()
    for sf in sf_dirs:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        rows = con.execute(
            f"SELECT DISTINCT lat_e7, lon_e7 FROM ({pages_cte_sql()}) "
            "WHERE lat_e7 IS NOT NULL"
        ).fetchall()
        coords.update(rows)
    def signed(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    recs = []
    for lat_e7, lon_e7 in sorted(coords):
        lat, lon = lat_e7 / 1e7, lon_e7 / 1e7
        recs.append(
            (lat_e7, lon_e7)
            + tuple(signed(s2_cell(lat, lon, lvl)) for lvl in (12, 13, 14, 15, 16))
        )
    pdf = pd.DataFrame(
        recs,
        columns=["lat_e7", "lon_e7", "s2_l12", "s2_l13", "s2_l14", "s2_l15", "s2_l16"],
    )
    for c in pdf.columns:
        pdf[c] = pdf[c].astype(np.int64)

    # cross-check the scalar derivation against the engine kernel — a
    # disagreement means one of the two is wrong; fail loudly either way
    from gdal_spark.kernels import s2cell as S2

    lat_a = pdf["lat_e7"].to_numpy() / 1e7
    lon_a = pdf["lon_e7"].to_numpy() / 1e7
    for lvl in (12, 16):
        kern = S2.latlon_to_cell(lat_a, lon_a, lvl).astype(np.int64)
        mism = (kern != pdf[f"s2_l{lvl}"].to_numpy()).sum()
        if mism:
            raise SystemExit(
                f"scalar vs kernel S2 disagreement at level {lvl}: {mism} points"
            )
    pdf.to_parquet(f"{out_dir}/s2_cells.parquet", index=False)
    print(f"s2_cells.parquet: {len(pdf)} lattice points (kernel cross-check OK)")

    # ---- geom_props
    g = pd.DataFrame(
        geom_props_rows(),
        columns=["zone_id", "name", "wkt", "geom_area", "cx", "cy"],
    )
    g.to_parquet(f"{out_dir}/geom_props.parquet", index=False)
    print(f"geom_props.parquet: {len(g)} zones")


if __name__ == "__main__":
    main()
