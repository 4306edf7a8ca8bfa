"""S2 cell ids (levels 0..30), implemented from the published S2 geometry
spec (s2geometry.io docs + the open-source s2geometry reference algorithm):

  lat/lon -> unit XYZ -> cube face (largest |component|) -> (u,v) gnomonic
  -> (s,t) via the S2_QUADRATIC_PROJECTION closed form
  -> leaf (i,j) in [0, 2^30) -> Hilbert-curve position (bit-pair iteration
  with the standard kIJtoPos / kPosToOrientation tables)
  -> 64-bit id: face(3 bits) | hilbert pos (2*30 bits) | trailing 1.

GDAL itself has no S2 index (SURVEY.md §2.3); these ids serve as the engine's
spatial bucketing keys per the north rule. Pure numpy, fully vectorized
(the 30-level Hilbert loop iterates over bit positions, not rows).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_SWAP = 1
_INVERT = 2
# index within row is ij = 2*i_bit + j_bit
_IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],  # canonical order
        [0, 3, 1, 2],  # axes swapped
        [2, 3, 1, 0],  # bits inverted
        [2, 1, 3, 0],  # swapped & inverted
    ],
    dtype=np.uint64,
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.uint64)


def _latlon_to_xyz(lat, lon):
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    # ValidFaceXYZtoUV (s2coords.h semantics)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),  # face 0: +x
            (lambda: -x / y, lambda: z / y),  # face 1: +y
            (lambda: -x / z, lambda: -y / z),  # face 2: +z
            (lambda: z / x, lambda: y / x),  # face 3: -x
            (lambda: z / y, lambda: -x / y),  # face 4: -y
            (lambda: -y / z, lambda: -x / z),  # face 5: -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _uv_to_st(u):
    """S2_QUADRATIC_PROJECTION UVtoST closed form."""
    u = np.asarray(u, dtype=np.float64)
    # np.where evaluates BOTH branches; mask each sqrt argument so the
    # discarded branch can't produce sqrt(<0) RuntimeWarnings for |u|>1/3
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _st_to_ij(s):
    i = np.floor((2.0**MAX_LEVEL) * np.asarray(s, dtype=np.float64)).astype(np.int64)
    return np.clip(i, 0, (1 << MAX_LEVEL) - 1).astype(np.uint64)


def _face_ij_to_id(face, i, j):
    """Leaf cell id from (face, i, j) — Hilbert bit-pair iteration."""
    face = np.asarray(face, dtype=np.uint64)
    pos = np.zeros(face.shape, dtype=np.uint64)
    orient = face & np.uint64(_SWAP)
    for k in range(MAX_LEVEL - 1, -1, -1):
        i_bit = (i >> np.uint64(k)) & np.uint64(1)
        j_bit = (j >> np.uint64(k)) & np.uint64(1)
        ij = (i_bit << np.uint64(1)) | j_bit
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    return (face << np.uint64(61)) | (pos << np.uint64(1)) | np.uint64(1)


def latlon_to_leaf(lat, lon) -> np.ndarray:
    """lat/lon -> level-30 leaf cell id (uint64)."""
    x, y, z = _latlon_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    return _face_ij_to_id(face, i, j)


def parent_at(cell_id, level: int) -> np.ndarray:
    """Ancestor id at the given level (uint64 in/out)."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cid & (~(lsb - np.uint64(1)))) | lsb


def latlon_to_cell(lat, lon, level: int) -> np.ndarray:
    """lat/lon -> S2 cell id at level, returned as int64 (Spark LongType).

    Bit pattern is the canonical S2 id; values with face>=4 appear negative
    in two's-complement int64 — ordering is not meaningful, identity is.
    """
    return parent_at(latlon_to_leaf(lat, lon), level).astype(np.int64)


def cell_level(cell_id) -> np.ndarray:
    """Level of a cell id = 30 - (position of lowest set bit)/2."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    lsb_pos = np.zeros(cid.shape, dtype=np.int64)
    tmp = cid.copy()
    # lowest set bit position, vectorized
    low = tmp & (~tmp + np.uint64(1))
    for b in (32, 16, 8, 4, 2, 1):
        mask = low >= (np.uint64(1) << np.uint64(b))
        lsb_pos += mask * b
        low = np.where(mask, low >> np.uint64(b), low)
    return MAX_LEVEL - lsb_pos // 2


def token(cell_id) -> str:
    """Canonical S2 token: 16-hex-digit id with trailing zeros stripped."""
    h = f"{int(np.uint64(cell_id)):016x}".rstrip("0")
    return h if h else "X"
