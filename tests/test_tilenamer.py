"""Tile codec conformance — vectors copied from the reference test
suite ``LasUtility.Tests/NlsTileNamer.Tests.cs:10-61`` (see
FIXTURES.md §1.4), plus encode/decode roundtrip properties."""

import numpy as np
import pytest

from lasutility_ray.geom import tilenamer as tn


def test_decode_1km_vector():
    assert tn.decode("V5211G2_1") == (518000, 7581000, 519000, 7582000)


def test_decode_12km_L_vector():
    assert tn.decode("V4323L") == (428000, 7554000, 440000, 7566000)


def test_encode_vectors():
    assert tn.encode(426502, 7214414, 1000) == "R4412H3_6"
    assert tn.encode(426502, 7214414, 3000) == "R4412H3"
    assert tn.encode(426502, 7214414, 12000) == "R4412R"
    assert tn.encode(380000, 6666000, 12000) == "L4133L"


def test_encode_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    e = rng.uniform(tn.MIN_ALLOWED_EAST, tn.MAX_ALLOWED_EAST - 1, 500)
    n = rng.uniform(tn.MIN_ALLOWED_NORTH, tn.MAX_ALLOWED_NORTH - 1, 500)
    for size in tn.SUPPORTED_SIZES:
        names = tn.encode(e, n, size)
        for i in range(0, 500, 37):
            assert names[i] == tn.encode(e[i], n[i], size)


@pytest.mark.parametrize("size", tn.SUPPORTED_SIZES)
def test_roundtrip_envelope_contains_point(size):
    rng = np.random.default_rng(size)
    e = rng.uniform(tn.MIN_ALLOWED_EAST, tn.MAX_ALLOWED_EAST - 1, 200)
    n = rng.uniform(tn.MIN_ALLOWED_NORTH, tn.MAX_ALLOWED_NORTH - 1, 200)
    names = tn.encode(e, n, size)
    for i in range(200):
        min_e, min_n, max_e, max_n = tn.decode(str(names[i]))
        assert min_e <= e[i] < max_e
        assert min_n <= n[i] < max_n
        assert max_n - min_n == size
        # east edge is 2x north edge at 24/48/96 km; square at <= 12 km
        expected_width = 2 * size if size >= 24000 else size
        assert max_e - min_e == expected_width


def test_out_of_bounds_raises():
    with pytest.raises(tn.TileNameError):
        tn.encode(0, 0, 1000)
    with pytest.raises(tn.TileNameError):
        tn.encode(tn.MAX_ALLOWED_EAST, 7000000, 1000)


def test_decode_validation():
    with pytest.raises(tn.TileNameError):
        tn.decode("A")
    with pytest.raises(tn.TileNameError):
        tn.decode("Z4")
    with pytest.raises(tn.TileNameError):
        tn.decode("K7")
    with pytest.raises(tn.TileNameError):
        tn.decode("K25")  # quad digit must be 1-4... "5" invalid


def test_12km_L_R_encode_decode_consistency():
    # every 12 km name decodes to a 12 km-wide envelope
    for e, n in [(428000, 7554000), (434000, 7554000), (440000, 7554000)]:
        name = tn.encode(e, n, 12000)
        assert name.endswith(("L", "R"))
        min_e, min_n, max_e, max_n = tn.decode(name)
        assert max_e - min_e == 12000
        assert min_e <= e < max_e
