"""Affine geotransform apply/invert, per GDAL semantics.

Reproduces:
/root/reference/alg/gdaltransformer.cpp:4490-4508 (GDALApplyGeoTransform)
  X = gt0 + pixel*gt1 + line*gt2 ; Y = gt3 + pixel*gt4 + line*gt5
/root/reference/alg/gdaltransformer.cpp:4516-4570 (GDALInvGeoTransform)
  rotation-free fast path when gt2 == gt4 == 0, else adjoint / determinant
  with singularity test |det| <= 1e-10 * magnitude^2.
"""

from __future__ import annotations

import numpy as np


def apply_geotransform(gt, pixel, line):
    """(pixel, line) -> (geo_x, geo_y). gt is a 6-sequence of floats."""
    pixel = np.asarray(pixel, dtype=np.float64)
    line = np.asarray(line, dtype=np.float64)
    x = gt[0] + pixel * gt[1] + line * gt[2]
    y = gt[3] + pixel * gt[4] + line * gt[5]
    return x, y


def inv_geotransform(gt):
    """Invert a 6-coeff geotransform. Returns the inverse 6-tuple.

    Raises ValueError when uninvertible (reference returns FALSE).
    """
    if gt[2] == 0.0 and gt[4] == 0.0 and gt[1] != 0.0 and gt[5] != 0.0:
        # Rotation-free fast path (gdaltransformer.cpp:4521-4541) — avoids
        # determinant precision issues.
        return (
            -gt[0] / gt[1],
            1.0 / gt[1],
            0.0,
            -gt[3] / gt[5],
            0.0,
            1.0 / gt[5],
        )

    det = gt[1] * gt[5] - gt[2] * gt[4]
    magnitude = max(abs(gt[1]), abs(gt[2]), abs(gt[4]), abs(gt[5]))
    if abs(det) <= 1e-10 * magnitude * magnitude:
        raise ValueError("uninvertible geotransform")
    inv_det = 1.0 / det
    return (
        (gt[2] * gt[3] - gt[0] * gt[5]) * inv_det,
        gt[5] * inv_det,
        -gt[2] * inv_det,
        (-gt[1] * gt[3] + gt[0] * gt[4]) * inv_det,
        -gt[4] * inv_det,
        gt[1] * inv_det,
    )
