"""The vectorized baseline entropy coder must emit BIT-IDENTICAL
scan bytes to the per-block reference (`_encode_block` + `_BitWriter`)
for every run/size/EOB/ZRL shape — the reference stays in the module
exactly to pin this."""

import numpy as np
import pytest

from lasutility_ray.geom.jpeg import (
    AC_CHROMA,
    AC_LUMA,
    DC_CHROMA,
    DC_LUMA,
    _BitWriter,
    _build_huffman,
    _encode_block,
    _entropy_encode,
    decode_jpeg,
    encode_jpeg,
)


def _enc_maps():
    maps = {}
    for (bits, vals), tclass in (
        (DC_LUMA, 0x00),
        (AC_LUMA, 0x10),
        (DC_CHROMA, 0x01),
        (AC_CHROMA, 0x11),
    ):
        _, enc = _build_huffman(bits, vals)
        maps[tclass] = enc
    return maps


def _reference(zz, comp, enc_maps):
    bw = _BitWriter()
    pred = [0, 0, 0]
    for i in range(len(zz)):
        ci = int(comp[i])
        dc_enc = enc_maps[0x00 if ci == 0 else 0x01]
        ac_enc = enc_maps[0x10 if ci == 0 else 0x11]
        _encode_block(bw, zz[i], pred, ci, dc_enc, ac_enc)
    bw.flush()
    # apply the same byte stuffing semantics (put() stuffs inline)
    return bytes(bw.buf)


def _random_blocks(rng, n, density):
    zz = np.zeros((n, 64), np.int64)
    zz[:, 0] = rng.integers(-1024, 1025, n)
    mask = rng.random((n, 63)) < density
    vals = rng.integers(-255, 256, (n, 63))
    vals[vals == 0] = 7
    zz[:, 1:] = np.where(mask, vals, 0)
    return zz


@pytest.mark.parametrize("density", [0.0, 0.02, 0.15, 0.6])
def test_vectorized_matches_reference_stream(density):
    rng = np.random.default_rng(int(density * 100) + 1)
    n = 120
    zz = _random_blocks(rng, n, density)
    comp = np.tile(np.array([0, 0, 1, 2], np.int64), n // 4)
    maps = _enc_maps()
    assert _entropy_encode(zz, comp, maps) == _reference(zz, comp, maps)


def test_vectorized_edge_shapes():
    """ZRL chains (run 16/31/47/62), value at position 63 (no EOB),
    all-zero AC, lone DC blocks, grey single component."""
    maps = _enc_maps()
    cases = []
    z = np.zeros(64, np.int64)
    z[0] = 5
    cases.append(z.copy())  # all-zero AC -> immediate EOB
    z2 = z.copy()
    z2[63] = -3  # run 62 -> 3 ZRLs + symbol, NO EOB after pos 63
    cases.append(z2)
    z3 = z.copy()
    z3[17], z3[34] = 1, -1  # run 16 -> exactly one ZRL
    cases.append(z3)
    z4 = z.copy()
    z4[1:64] = 1  # dense: no runs at all
    cases.append(z4)
    z5 = z.copy()
    z5[48] = 255  # run 47 -> two ZRLs + (15, size)
    cases.append(z5)
    zz = np.stack(cases)
    comp = np.zeros(len(zz), np.int64)  # grey
    assert _entropy_encode(zz, comp, maps) == _reference(zz, comp, maps)
    # interleaved 3-component DC prediction chains
    zz6 = np.tile(zz, (3, 1))
    comp6 = np.repeat(np.array([0, 1, 2], np.int64), len(zz))
    order = np.argsort(np.tile(np.arange(len(zz)), 3), kind="stable")
    assert _entropy_encode(zz6[order], comp6[order], maps) == _reference(
        zz6[order], comp6[order], maps
    )


def test_full_encoder_roundtrips_after_vectorization():
    rng = np.random.default_rng(7)
    img = np.clip(
        np.linspace(0, 220, 96 * 80).reshape(96, 80)[..., None]
        + rng.integers(-25, 25, (96, 80, 3)),
        0,
        255,
    ).astype(np.uint8)
    for sub, bound in (("444", 6.0), ("420", 11.0)):  # 4:2:0 averages
        # away the random chroma noise — higher inherent loss
        data = encode_jpeg(img, quality=92, subsample=sub)
        out = decode_jpeg(data)
        mae = np.abs(out.astype(int) - img.astype(int)).mean()
        assert mae < bound, (sub, mae)
    grey = img[..., 0]
    out = decode_jpeg(encode_jpeg(grey, quality=92))
    assert np.abs(out.astype(int) - grey.astype(int)).mean() < 4.0
