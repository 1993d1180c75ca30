"""Layered LAZ (compressor 3, POINT14/RGB14/RGBNIR14 v3) round-trip
tests — every field bit-exact through write -> read, at chunk
boundaries, across scanner-channel context switches, and through the
per-chunk parallel read units. See the fidelity contract in
``lasutility_ray/sources/laz14.py`` (self-consistency is pinned here;
external-LASzip conformance is unvalidatable in this sandbox)."""

import struct

import numpy as np
import pytest

from lasutility_ray.sources.laz import (
    laz_read_units,
    read_laz_chunk_points,
    read_laz_points,
)
from lasutility_ray.sources.laz14 import (
    _pack_p14,
    decode_chunk14,
    encode_chunk14,
    write_laz14,
)


def _corpus(n: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    return dict(
        x=500000 + np.round(rng.uniform(0, 100, n) / 0.01) * 0.01,
        y=6800000 + np.round(rng.uniform(0, 100, n) / 0.01) * 0.01,
        z=np.round(rng.uniform(0, 50, n) / 0.01) * 0.01,
        classification=rng.integers(0, 32, n).astype(np.uint8),
        intensity=rng.integers(0, 65536, n).astype(np.uint16),
        gps_time=np.cumsum(rng.uniform(0, 1e-4, n)) + 300000.0,
        return_number=rng.integers(1, 6, n).astype(np.uint8),
        number_of_returns=rng.integers(1, 8, n).astype(np.uint8),
        scanner_channel=rng.integers(0, 4, n).astype(np.uint8),
        scan_angle=rng.integers(-5000, 5000, n).astype(np.int16),
        user_data=rng.integers(0, 256, n).astype(np.uint8),
        point_source=rng.integers(0, 1000, n).astype(np.uint16),
        rgb=tuple(rng.integers(0, 65536, n).astype(np.uint16) for _ in range(3)),
        nir=rng.integers(0, 65536, n).astype(np.uint16),
    )


@pytest.mark.parametrize("pfmt", [6, 7, 8])
def test_round_trip_formats(tmp_path, pfmt):
    n = 5000
    c = _corpus(n)
    kw = dict(c)
    if pfmt < 8:
        kw.pop("nir")
    if pfmt < 7:
        kw.pop("rgb")
    path = str(tmp_path / f"f{pfmt}.laz")
    write_laz14(path, kw.pop("x"), kw.pop("y"), kw.pop("z"), chunk_size=1000, **kw)
    out = read_laz_points(path)
    assert out["n_points"] == n
    np.testing.assert_allclose(out["x"], c["x"], atol=1e-9)
    np.testing.assert_allclose(out["y"], c["y"], atol=1e-9)
    np.testing.assert_allclose(out["z"], c["z"], atol=1e-9)
    assert (out["classification"] == c["classification"]).all()
    assert (out["intensity"] == c["intensity"]).all()
    assert (out["gps_time"] == c["gps_time"]).all()
    if pfmt >= 7:
        for k, arr in zip(("red", "green", "blue"), c["rgb"]):
            assert (out[k] == arr).all()


def test_parallel_units_match_whole_file(tmp_path):
    n = 5000
    c = _corpus(n, seed=3)
    path = str(tmp_path / "units.laz")
    write_laz14(
        path, c["x"], c["y"], c["z"], classification=c["classification"],
        gps_time=c["gps_time"], rgb=c["rgb"], chunk_size=700,
    )
    units = laz_read_units(path)
    assert len(units) == (n + 699) // 700  # one unit per chunk
    assert all(u["fmt14"] == 7 for u in units)
    whole = read_laz_points(path)
    for key in ("x", "y", "z", "classification", "gps_time", "red"):
        got = np.concatenate([read_laz_chunk_points(u)[key] for u in units])
        assert np.array_equal(got, whole[key]), key


def test_edge_sizes(tmp_path):
    e = np.array([], dtype=np.float64)
    p0 = str(tmp_path / "empty.laz")
    write_laz14(p0, e, e, e)
    assert read_laz_points(p0)["n_points"] == 0

    one = np.array([500000.5])
    p1 = str(tmp_path / "one.laz")
    write_laz14(p1, one, one, one)
    out = read_laz_points(p1)
    assert out["n_points"] == 1 and out["x"][0] == 500000.5

    # n an exact multiple of chunk_size (no short tail chunk)
    x = 500000 + np.arange(2000) * 0.01
    p2 = str(tmp_path / "exact.laz")
    write_laz14(p2, x, x, x, chunk_size=1000)
    out = read_laz_points(p2)
    assert out["n_points"] == 2000
    np.testing.assert_allclose(out["x"], x, atol=1e-9)


def test_constant_fields(tmp_path):
    # all-identical points: every layer is near-empty, gps never changes
    c = np.full(500, 500000.0)
    path = str(tmp_path / "const.laz")
    write_laz14(path, c, c, c, gps_time=np.full(500, 7.5))
    out = read_laz_points(path)
    assert out["n_points"] == 500
    assert (out["gps_time"] == 7.5).all()
    np.testing.assert_allclose(out["x"], c, atol=1e-9)


def _random_records(rng, n: int, pfmt: int):
    """Adversarial raw records: full-range coordinates (stressing the
    32-bit corrector), random return/flag bytes (context switches on
    most points), gps times hopping between four sequences."""
    recs = []
    gvals = [300000.0, 500000.0, 100.0, 42.0]
    for i in range(n):
        gps = struct.unpack(
            "<q",
            struct.pack("<d", gvals[rng.integers(0, 4)] + i * rng.uniform(0, 1e-3)),
        )[0]
        rec = _pack_p14(
            int(rng.integers(-(2**31), 2**31)),
            int(rng.integers(-(2**31), 2**31)),
            int(rng.integers(-(2**31), 2**31)),
            int(rng.integers(0, 65536)),
            int(rng.integers(0, 256)),
            int(rng.integers(0, 256)),  # random flags: scan_dir/edge/channel
            int(rng.integers(0, 256)),
            int(rng.integers(0, 256)),
            int(rng.integers(-32768, 32768)),
            int(rng.integers(0, 65536)),
            gps,
        )
        if pfmt >= 7:
            rec += struct.pack("<HHH", *(int(v) for v in rng.integers(0, 65536, 3)))
        if pfmt == 8:
            rec += struct.pack("<H", int(rng.integers(0, 65536)))
        recs.append(rec)
    return recs


@pytest.mark.parametrize("pfmt", [6, 7, 8])
def test_record_level_bit_exact_adversarial(pfmt):
    rng = np.random.default_rng(7 + pfmt)
    for _ in range(3):
        recs = _random_records(rng, 600, pfmt)
        blob = encode_chunk14(recs, pfmt)
        got, end = decode_chunk14(blob, 0, len(recs), pfmt)
        assert end == len(blob)
        assert got == recs  # every byte of every field survives


def test_truncated_chunk_raises():
    rng = np.random.default_rng(11)
    recs = _random_records(rng, 100, 6)
    blob = encode_chunk14(recs, 6)
    with pytest.raises((ValueError, IndexError)):
        decode_chunk14(blob[: len(blob) // 2], 0, 100, 6)
    with pytest.raises(ValueError):
        decode_chunk14(blob, 0, 99, 6)  # count mismatch fails loudly


def test_nir_requires_rgb():
    one = np.array([1.0])
    with pytest.raises(ValueError):
        write_laz14("/tmp/never.laz", one, one, one, nir=np.array([5], np.uint16))


def test_read_laz_dataset_layered(tmp_path, ray_session):
    """A layered (compressor-3) file flows through the Ray source with
    one decode task per chunk, same columns as the v2 path."""
    from lasutility_ray.sources.laz import read_laz_dataset

    n = 3000
    c = _corpus(n, seed=9)
    c["x"] = 500000 + np.arange(n) * 0.01  # distinct: unambiguous sort key
    path = str(tmp_path / "ds.laz")
    write_laz14(
        path, c["x"], c["y"], c["z"], classification=c["classification"],
        gps_time=c["gps_time"], rgb=c["rgb"], chunk_size=1000,
    )
    df = read_laz_dataset(path).to_pandas().sort_values("x").reset_index(drop=True)
    assert len(df) == n
    np.testing.assert_allclose(df["x"].to_numpy(), c["x"], atol=1e-9)
    assert (df["red"].to_numpy() == c["rgb"][0]).all()
    assert (df["classification"].to_numpy() == c["classification"]).all()
