"""Geodesic kernel vs the reference's pinned PROJ/Karney values
(autotest/ogr/ogr_geom.py test_ogr_geom_GeodesicArea :4472,
test_ogr_geom_GeodesicLength :4656)."""

import pytest

from gdal_spark.kernels import geodesic as GD

TRI = [(2, 49), (3, 49), (3, 48), (2, 49)]  # lon/lat
POLAR = [(2, 89), (3, 89), (3, 88), (2, 89)]


def test_inverse_edges_match_reference():
    assert GD.vincenty_inverse(49, 2, 49, 3)[0] == pytest.approx(
        73171.26435678436
    )
    assert GD.vincenty_inverse(49, 3, 48, 3)[0] == pytest.approx(
        111200.0367623785
    )
    assert GD.vincenty_inverse(48, 3, 49, 2)[0] == pytest.approx(
        133514.4852804854
    )


def test_perimeters_match_reference():
    assert GD.ring_length(TRI) == pytest.approx(317885.78639964823)
    assert GD.ring_length(POLAR) == pytest.approx(225369.66747743438)


def test_areas_match_reference():
    # rel 1e-6 is the reference's own pytest.approx bar; we land ~1e-9
    assert GD.ring_geodesic_area(TRI) == pytest.approx(
        4068384291.8911743, rel=1e-6
    )
    assert GD.ring_geodesic_area(POLAR) == pytest.approx(
        108860488.12023926, rel=1e-6
    )


def test_area_lon_shift_invariant():
    shifted = [(x + 10, y) for x, y in TRI]
    assert GD.ring_geodesic_area(shifted) == pytest.approx(
        GD.ring_geodesic_area(TRI), rel=1e-12
    )


def test_hole_equals_shell_is_zero():
    assert GD.polygons_geodesic_area([[TRI, TRI]]) == pytest.approx(0.0, abs=1e-3)


def test_multipolygon_sums():
    assert GD.polygons_geodesic_area([[TRI], [POLAR]]) == pytest.approx(
        4068384291.8911743 + 108860488.12023926, rel=1e-6
    )


def test_direct_inverse_roundtrip():
    s, a1 = GD.vincenty_inverse(48, 3, 49, 2)
    lat2, lon2 = GD.vincenty_direct(48, 3, a1, s)
    assert lat2 == pytest.approx(49, abs=1e-9)
    assert lon2 == pytest.approx(2, abs=1e-9)


def test_densification_converges():
    coarse = GD.ring_geodesic_area(TRI, max_seg_m=200_000.0)
    fine = GD.ring_geodesic_area(TRI, max_seg_m=2_000.0)
    assert abs(fine - 4068384291.89) < abs(coarse - 4068384291.89)
