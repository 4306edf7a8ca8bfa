"""DEM focal kernels (hillshade / slope / aspect / TRI / TPI / roughness),
reference-exact math over numpy windows.

Formulas from /root/reference/apps/gdaldem_lib.cpp:
  * Horn gradient (:780-793): x = ((w0+2w3+w6)-(w2+2w5+w8))/ewres,
    y = ((w6+2w7+w8)-(w0+2w1+w2))/nsres  (window indices row-major,
    w4 = center; ewres/nsres = gt[1], gt[5] including sign);
  * hillshade (:1010-1026, data :1170-1193): z_factor = z/8 (Horn),
    cang = 254*(sin(alt) - (y*cos(az)cos(alt)z - x*sin(az)cos(alt)z))
           / sqrt(1 + z^2 (x^2+y^2));  out = cang<=0 ? 1 : 1+cang;
  * slope Horn (:1345-1366): degrees = atan(sqrt(dx^2+dy^2)/8)*180/pi
    with dx,dy divided by ewres/nsres; percent = 100*sqrt(key)/8;
  * aspect (:1415+): atan2(dy, -dx) variants;
  * TRI/TPI/roughness: neighborhood stats (mean abs diff / center minus
    mean / max-min).

All inputs are (h+2, w+2) PADDED arrays; outputs are (h, w). Edge pixels
of the full raster follow the reference default (no compute-at-edges):
callers pad the raster boundary with nodata and mask results there.
"""

from __future__ import annotations

import numpy as np

DEG = 180.0 / np.pi


def _windows(p: np.ndarray):
    """w0..w8 views of the padded array (row-major 3x3, w4 = center)."""
    return [
        p[0:-2, 0:-2], p[0:-2, 1:-1], p[0:-2, 2:],
        p[1:-1, 0:-2], p[1:-1, 1:-1], p[1:-1, 2:],
        p[2:, 0:-2], p[2:, 1:-1], p[2:, 2:],
    ]


def horn_gradient(p: np.ndarray, ewres: float, nsres: float):
    w = _windows(p)
    x = ((w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])) * (1.0 / ewres)
    y = ((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])) * (1.0 / nsres)
    return x, y


def hillshade(
    p: np.ndarray, ewres: float, nsres: float,
    z: float = 1.0, alt: float = 45.0, az: float = 315.0,
) -> np.ndarray:
    x, y = horn_gradient(p, ewres, nsres)
    zf = z / 8.0
    altr = np.deg2rad(alt)
    azr = np.deg2rad(az)
    cos_alt_z = np.cos(altr) * zf
    num = 254.0 * np.sin(altr) - (
        y * (254.0 * np.cos(azr) * cos_alt_z) - x * (254.0 * np.sin(azr) * cos_alt_z)
    )
    cang = num / np.sqrt(1.0 + zf * zf * (x * x + y * y))
    return np.where(cang <= 0.0, 1.0, 1.0 + cang)


def slope(p: np.ndarray, ewres: float, nsres: float, percent: bool = False) -> np.ndarray:
    x, y = horn_gradient(p, ewres, nsres)
    key = x * x + y * y
    if percent:
        return 100.0 * (np.sqrt(key) / 8.0)
    return np.arctan(np.sqrt(key) / 8.0) * DEG


def aspect(p: np.ndarray, azimuth: bool = True) -> np.ndarray:
    """gdaldem aspect (GDALAspectAlg): atan2 over the unscaled Horn
    gradient; azimuth convention converts to 0..360 from north."""
    w = _windows(p)
    dx = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
    dy = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
    a = np.arctan2(dy, -dx) * DEG
    if azimuth:
        a = np.where(a < 0, 90.0 - a, np.where(a > 90.0, 360.0 - a + 90.0, 90.0 - a))
    return a


def tri(p: np.ndarray) -> np.ndarray:
    """Riley TRI: mean |neighbor - center| (gdaldem default)."""
    w = _windows(p)
    c = w[4]
    acc = sum(np.abs(w[i] - c) for i in range(9) if i != 4)
    return acc / 8.0


def tpi(p: np.ndarray) -> np.ndarray:
    w = _windows(p)
    c = w[4]
    mean = (sum(w[i] for i in range(9)) - c) / 8.0
    return c - mean


def roughness(p: np.ndarray) -> np.ndarray:
    w = _windows(p)
    return np.maximum.reduce(w) - np.minimum.reduce(w)
