"""From-scratch GIF codec: LZW width-ladder round trips (9->12 bit,
deferred clear), animation compositing (transparency + disposal),
error paths, and the video frame-sample stage over real GIF bytes."""

import numpy as np
import pyarrow as pa
import pytest

from lasutility_ray.geom.gif import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from lasutility_ray.stages.multimodal import (
    HEADER,
    MAGIC,
    decode_video,
    frame_sample,
)

GREY256 = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("min_code", [2, 4, 8])
@pytest.mark.parametrize("seed", [0, 1])
def test_lzw_roundtrip_random(min_code, seed):
    n_sym = 1 << min_code
    data = _rng(seed).integers(0, n_sym, 5000, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data, min_code), min_code, len(data)) == data


def test_lzw_roundtrip_hits_table_full_and_clear():
    # 64k random bytes at min=8 drives the width ladder to 12 bits and
    # through at least one mid-stream CLEAR reset
    data = _rng(7).integers(0, 256, 65536, dtype=np.uint8).tobytes()
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data


def test_lzw_roundtrip_repetitive():
    data = (b"abab" * 3000) + (b"\x00" * 5000)
    assert _lzw_decode(_lzw_encode(data, 8), 8, len(data)) == data


def test_gif_single_frame_roundtrip():
    f = _rng(3).integers(0, 256, (24, 31), dtype=np.uint8)
    gif = encode_gif([f], GREY256)
    frames, delays = decode_gif(gif)
    assert len(frames) == 1
    assert np.array_equal(frames[0], GREY256[f])
    assert delays == [4]


def test_gif_animation_roundtrip_and_delays():
    fs = [
        _rng(i).integers(0, 16, (16, 16), dtype=np.uint8) for i in range(5)
    ]
    pal = np.zeros((16, 3), np.uint8)
    pal[:, 0] = np.arange(16) * 16
    gif = encode_gif(fs, pal, delays=[1, 2, 3, 4, 5])
    frames, delays = decode_gif(gif)
    assert delays == [1, 2, 3, 4, 5]
    for got, idx in zip(frames, fs):
        assert np.array_equal(got, pal[idx])


def test_gif_transparency_composites_over_previous():
    # frame 2 marks index 0 transparent -> those pixels keep frame 1
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]], np.uint8)
    f1 = np.full((4, 4), 1, np.uint8)
    f2 = np.zeros((4, 4), np.uint8)
    f2[0, 0] = 2
    import struct

    from lasutility_ray.geom.gif import _lzw_encode as enc, _sub_blocks

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 0x01 | 0x10, 0, 0)
    out += pal.tobytes()
    for frame, transparent in ((f1, None), (f2, 0)):
        packed = 0x01 if transparent is not None else 0
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", packed, 2, transparent or 0
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
        out.append(2)
        out += _sub_blocks(enc(frame.tobytes(), 2))
    out += b"\x3b"
    frames, _ = decode_gif(bytes(out))
    assert np.array_equal(frames[0], pal[f1])
    expect = pal[f1].copy()
    expect[0, 0] = pal[2]
    assert np.array_equal(frames[1], expect)


def test_gif_error_paths():
    with pytest.raises(GifError):
        decode_gif(b"NOTAGIF" * 4)
    f = np.zeros((4, 4), np.uint8)
    gif = bytearray(encode_gif([f], GREY256))
    gif[-10] ^= 0xFF  # corrupt LZW payload
    with pytest.raises((GifError, NotImplementedError)):
        decode_gif(bytes(gif))
    with pytest.raises(GifError):
        encode_gif([f], GREY256[:3])  # non-power-of-two palette
    with pytest.raises(GifError):
        encode_gif([np.full((2, 2), 9, np.uint8)], GREY256[:8])  # oob index


def test_decode_video_gif_and_grd1():
    f = _rng(11).integers(0, 256, (8, 9), dtype=np.uint8)
    frames = decode_video(encode_gif([f, f], GREY256))
    assert len(frames) == 2 and frames[0].shape == (8, 9, 3)
    raw = HEADER.pack(MAGIC, 9, 8, 1) + f.tobytes()
    frames = decode_video(raw + raw)
    assert len(frames) == 2 and np.array_equal(frames[0], f)
    # MP4 containers are parsed for real now (geom/mp4.py): a
    # moov-less ftyp fragment is malformed data, not a stubbed format
    from lasutility_ray.geom.mp4 import Mp4DataError

    with pytest.raises(Mp4DataError):
        decode_video(b"\x00\x00\x00\x10ftypmp42xxxxxxxx" + b"\x00\x00\x00\x08free")
    with pytest.raises(NotImplementedError):
        decode_video(b"RIFX" + b"x" * 32)


def test_frame_sample_on_gif_batch():
    fs = [np.full((4, 5), i, np.uint8) for i in range(8)]
    gif = encode_gif(fs, GREY256)
    batch = pa.table({"video": pa.array([gif], pa.large_binary())})
    out = frame_sample(batch, every=3)
    data = out.column("video")[0].as_py()
    # frames 0, 3, 6 survive as GRD1 RGB concatenation
    kept = []
    off = 0
    while off < len(data):
        _, w, h, c = HEADER.unpack_from(data, off)
        off += HEADER.size
        kept.append(
            np.frombuffer(data, np.uint8, w * h * c, off).reshape(h, w, c)
        )
        off += w * h * c
    assert len(kept) == 3
    for got, i in zip(kept, (0, 3, 6)):
        assert np.array_equal(got, GREY256[fs[i]])


def test_fuzz_truncation_and_corruption_raise_typed_errors():
    # malformed streams must raise GifError/NotImplementedError, never
    # bare IndexError/struct.error (fuzz-pinned hardening)
    good = encode_gif(
        [_rng(0).integers(0, 256, (16, 16), np.uint8) for _ in range(2)], GREY256
    )
    for i in range(1, len(good), 5):
        with pytest.raises((GifError, NotImplementedError)):
            decode_gif(good[:i])
    for seed in range(80):
        r = np.random.default_rng(seed)
        g = bytearray(good)
        for _ in range(4):
            g[r.integers(0, len(g))] = r.integers(0, 256)
        try:
            decode_gif(bytes(g))  # may still decode; flips can be benign
        except (GifError, NotImplementedError):
            pass
    for seed in range(60):
        r = np.random.default_rng(seed + 9999)
        blob = b"GIF89a" + r.integers(0, 256, 120, dtype=np.uint8).tobytes()
        try:
            decode_gif(blob, max_pixels=1 << 20)
        except (GifError, NotImplementedError):
            pass


def test_huge_canvas_rejected():
    import struct

    blob = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0) + b"\x3b"
    with pytest.raises(GifError):
        decode_gif(blob)


def test_interlaced_frame_decodes_to_natural_order():
    import struct

    from lasutility_ray.geom.gif import _lzw_encode, _sub_blocks

    ih, iw = 13, 7  # odd height exercises all four pass boundaries
    # NOTE: uint8 % python-int promotes to int16 — astype AFTER the mod
    frame = (np.arange(ih * iw) % 256).astype(np.uint8).reshape(ih, iw)
    order = np.concatenate(
        [np.arange(s, ih, step) for s, step in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )
    wire_rows = frame[order]  # rows as an interlaced encoder emits them
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", iw, ih, 0x80 | 0x07 | 0x70, 0, 0)
    out += GREY256.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, iw, ih, 0x40)  # interlace flag
    out.append(8)
    out += _sub_blocks(_lzw_encode(wire_rows.tobytes(), 8))
    out += b"\x3b"
    frames, _ = decode_gif(bytes(out))
    assert np.array_equal(frames[0], GREY256[frame])
