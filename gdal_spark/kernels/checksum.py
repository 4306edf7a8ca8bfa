"""GDAL raster checksum, bit-exact.

Reproduces /root/reference/alg/gdalchecksum.cpp:48-375 (GDALChecksumImage):
  * primes cycle 7,11,13,17,19,23,29,31,37,41,43 in row-major pixel order;
  * accumulate nChecksum += pixel % prime (C semantics: % truncates toward
    zero, so negative pixels contribute negative remainders);
  * nChecksum &= 0xffff after every pixel;
  * floating-point inputs convert via GDALCopyWords double->Int32:
    val += 0.5; clamp to [-2147483647, 2147483647]; floor; non-finite -> INT_MIN.

Golden: autotest/gcore/data/byte.tif (20x20 byte) -> 4672
(autotest/gcore/tiff_read.py:45).
"""

from __future__ import annotations

import numpy as np

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _float_to_int32(arr: np.ndarray) -> np.ndarray:
    out = np.empty(arr.shape, dtype=np.int64)
    finite = np.isfinite(arr)
    out[~finite] = np.iinfo(np.int32).min
    v = arr[finite] + 0.5
    v = np.clip(v, -2147483647.0, 2147483647.0)
    out[finite] = np.floor(v).astype(np.int64)
    return out


def checksum(pixels: np.ndarray) -> int:
    """Checksum a 2-D (or flattened row-major) pixel array."""
    flat = np.asarray(pixels).ravel()
    if flat.dtype.kind == "f":
        vals = _float_to_int32(flat)
    else:
        vals = flat.astype(np.int64)
    n = vals.shape[0]
    primes = PRIMES[np.arange(n) % 11]
    # C '%' truncates toward zero: np.fmod matches for integer-valued floats;
    # for int64 use sign-aware remainder.
    rem = np.sign(vals) * (np.abs(vals) % primes)
    # The running &= 0xffff is a mod-65536 of the partial sums; since the
    # final value only depends on the total mod 65536 (& is applied after
    # every add and addition is associative mod 2^16 for the low bits of a
    # two's-complement sum), accumulate then mask. Negative partials in C
    # wrap identically under & 0xffff.
    return int(rem.sum() & 0xFFFF)
