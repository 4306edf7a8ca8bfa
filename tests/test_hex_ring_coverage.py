"""Hex k-ring metric coverage: kNN ring completeness depends on the
k-ring disk covering a known metric radius around ANY query point —
including adversarial points at cell corners and across aperture-7
"parent" scale boundaries (the planar axial grid has no icosahedron
seams; its only discontinuity is the dateline, where the mercator plane
ends — documented, and kNN fixtures keep dateline queries on the exact
brute path)."""

import numpy as np

from gdal_spark.kernels import hexcell as HX


def _cell_of_meters(mx, my, res):
    q, r = HX.meters_to_axial(np.asarray(mx), np.asarray(my), res)
    return HX.pack(np.full_like(q, res), q, r)


def test_k_ring_covers_metric_disk():
    """Every point within (ring * inradius) of a query point falls in a
    cell of the query's k_ring disk — for query points ON cell corners
    and edges (worst case), at two resolutions spanning an aperture-7
    scale step."""
    rng = np.random.RandomState(42)
    for res in (7, 8):
        s = float(HX.hex_size(res))
        inr = np.sqrt(3.0) / 2.0 * s
        ring = 2
        guaranteed = ring * inr * 0.999
        # query points: random + perturbed toward cell corners
        mx = rng.uniform(-1e7, 1e7, 40)
        my = rng.uniform(-5e6, 5e6, 40)
        qc, rc = HX.meters_to_axial(mx, my, res)
        cx, cy = HX.axial_to_meters(qc, rc, res)
        # corner of a pointy-top hex: center + s at 30deg-multiples
        ang = rng.randint(0, 6, 40) * (np.pi / 3.0) + np.pi / 6.0
        corner_x = cx + 0.9999 * s * np.cos(ang)
        corner_y = cy + 0.9999 * s * np.sin(ang)
        for px, py in [(mx, my), (corner_x, corner_y)]:
            cells = _cell_of_meters(px, py, res)
            disks = HX.k_ring(cells, ring)
            for i in range(len(px)):
                disk = set(int(c) for c in np.asarray(disks[i]).ravel())
                for theta in np.linspace(0, 2 * np.pi, 24, endpoint=False):
                    tx = px[i] + guaranteed * np.cos(theta)
                    ty = py[i] + guaranteed * np.sin(theta)
                    c = int(_cell_of_meters([tx], [ty], res)[0])
                    assert c in disk, (res, i, theta)


def test_k_ring_disk_size_and_uniqueness():
    """Ring-k disk has exactly 1+3k(k+1) distinct cells (planar hex grid,
    no seams/pentagons to collapse cells)."""
    cells = _cell_of_meters([12345.0], [-98765.0], 9)
    for k in (1, 2, 3):
        disk = np.asarray(HX.k_ring(cells, k))[0]
        assert len(set(int(c) for c in disk)) == 1 + 3 * k * (k + 1)
