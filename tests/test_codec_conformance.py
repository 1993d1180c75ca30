"""Codec conformance vectors HAND-DERIVED from the public specs.

Every stream in this file was assembled by hand on paper from the
normative documents (ITU-T T.81 for JPEG, GIF87a specification for
GIF-LZW) — NOT by running the repo's own encoders — so a decoder bug
that a matching encoder bug would mask still fails here. The
derivations are written out in comments so they can be re-checked
against the specs.

(The LAZ compressor-3 layered format has no tractable hand-assembled
vector — a single chunk needs a full arithmetic-coder trace — so its
conformance caveat stands; see sources/laz14.py.)
"""

import struct

import numpy as np
import pytest


# ------------------------------------------------------------- JPEG

# Canonical Huffman codes for the T.81 Annex K.3.1 DC luminance table
# derived BY HAND from the BITS/HUFFVAL lists (C.2 canonical rule:
# codes assigned in value order, left-aligned, doubling per length):
#   BITS = 0,1,5,1,1,1,1,1,1  ->  len2: cat0
#                                 len3: cat1..cat5
#                                 len4: cat6, len5: cat7, ...
HAND_DC_LUMA_CODES = {
    0: ("00", 2),
    1: ("010", 3),
    2: ("011", 3),
    3: ("100", 3),
    4: ("101", 3),
    5: ("110", 3),
    6: ("1110", 4),
    7: ("11110", 5),
    8: ("111110", 6),
}

# First codes of the K.3.2 AC luminance table, same hand derivation:
#   BITS = 0,2,1,3,...; HUFFVAL order 0x01,0x02,0x03,0x00,0x04,0x11...
HAND_AC_LUMA_CODES = {
    0x01: ("00", 2),
    0x02: ("01", 2),
    0x03: ("100", 3),
    0x00: ("1010", 4),  # EOB — the famous 1010
    0x04: ("1011", 4),
    0x11: ("1100", 4),
    0x05: ("11010", 5),
    0x12: ("11011", 5),
    0x21: ("11100", 5),
}


def test_annex_k_canonical_codes_match_hand_derivation():
    from lasutility_ray.geom.jpeg import AC_LUMA, DC_LUMA, _build_huffman

    _, dc_enc = _build_huffman(*DC_LUMA)
    for v, (bits, ln) in HAND_DC_LUMA_CODES.items():
        assert dc_enc[v] == (int(bits, 2), ln), v
    _, ac_enc = _build_huffman(*AC_LUMA)
    for v, (bits, ln) in HAND_AC_LUMA_CODES.items():
        assert ac_enc[v] == (int(bits, 2), ln), v


def _jpeg_headers_8x8_grey_q1() -> bytearray:
    """Minimal single-component 8x8 frame with an IDENTITY quant table
    (so entropy-coded coefficients pass through unscaled) and the
    Annex K luminance Huffman tables."""
    from lasutility_ray.geom.jpeg import AC_LUMA, DC_LUMA, ZIGZAG

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    for (bits, vals), tclass in ((DC_LUMA, 0x00), (AC_LUMA, 0x10)):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tclass)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    return out


def _idct_reference(coef_natural: np.ndarray) -> np.ndarray:
    """Independent IDCT straight from the T.81 A.3.3 formula (no reuse
    of the codec's matrices)."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef_natural[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)


def test_hand_assembled_jpeg_flat_dc_block():
    """Entropy bytes derived by hand: DC diff +16 (SSSS=5, code 110,
    magnitude 10000), EOB (1010) ->
    bits 110 10000 1010 + 1111 pad = 0xD0 0xAF.
    Expected: DC-only block, every pixel 16/8 + 128 = 130."""
    from lasutility_ray.geom.jpeg import decode_jpeg

    data = _jpeg_headers_8x8_grey_q1() + bytes([0xD0, 0xAF]) + b"\xff\xd9"
    img = decode_jpeg(bytes(data))
    assert img.shape == (8, 8)
    assert (img == 130).all()


def test_hand_assembled_jpeg_dc_plus_ac_block():
    """DC diff -16 (SSSS=5, code 110, magnitude = -16 + 31 = 01111),
    AC run0/SSSS2 for +3 at zigzag index 1 (symbol 0x02 -> code 01,
    magnitude 11), EOB (1010) ->
    bits 110 01111 01 11 1010 = 0xCF 0x7A (exactly 16 bits, no pad).
    Natural-order coefficients: (0,0)=-16, (0,1)=+3."""
    from lasutility_ray.geom.jpeg import decode_jpeg

    data = _jpeg_headers_8x8_grey_q1() + bytes([0xCF, 0x7A]) + b"\xff\xd9"
    img = decode_jpeg(bytes(data))
    coef = np.zeros((8, 8))
    coef[0, 0] = -16.0
    coef[0, 1] = 3.0
    assert np.array_equal(img, _idct_reference(coef))


# -------------------------------------------------------------- GIF


def _pack_lsb(codes, widths):
    """GIF bit packing (spec appendix): codes fill bytes LSB-first."""
    acc = 0
    nbits = 0
    out = bytearray()
    for c, w in zip(codes, widths):
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_hand_assembled_gif_lzw_stream():
    """2x2 two-color image, pixels [0,1,1,0], LZW minimum code size 2
    (spec floor for tiny palettes): clear=4, end=5, first dynamic
    code=6, initial width 3.

    Hand LZW trace (GIF87a appendix algorithm):
      emit CLEAR(4)                             width 3
      cur=0; see 1: '01' new -> emit 0, add #6  width 3
      cur=1; see 1: '11' new -> emit 1, add #7  width 3
      cur=1; see 0: '10' new -> emit 1, add #8  width 3 at emit;
                                adding #8 == 1<<3 bumps width to 4
      cur=0; end of data   -> emit 0, emit END(5) at width 4
    Code sequence: 4,0,1,1 at 3 bits, then 0,5 at 4 bits (the spec's
    code-size ladder: the NEXT dictionary slot dictates the width)."""
    from lasutility_ray.geom.gif import decode_gif

    lzw = _pack_lsb([4, 0, 1, 1, 0, 5], [3, 3, 3, 3, 4, 4])
    gif = bytearray(b"GIF87a")
    gif += struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)  # GCT, 2 entries
    gif += bytes([0, 0, 0, 255, 255, 255])  # palette: black, white
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    gif += bytes([2])  # LZW minimum code size
    gif += bytes([len(lzw)]) + lzw + b"\x00"
    gif += b"\x3b"
    frames = decode_gif(bytes(gif))
    frame = frames[0] if isinstance(frames, (list, tuple)) else frames
    arr = np.asarray(frame)
    if arr.ndim == 4:  # (n_frames, h, w, c)
        arr = arr[0]
    expected_idx = np.array([[0, 1], [1, 0]])
    # compare via the palette: index 0 -> black, 1 -> white
    lum = arr[..., 0] if arr.ndim == 3 else arr
    assert np.array_equal((lum > 127).astype(int), expected_idx)
