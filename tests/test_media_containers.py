"""MP4 (ISO-BMFF) container + MP3 frame-walk metadata tests.

geom/mp4.py parses the full box tree / sample tables and muxes a
minimal conforming file; geom/mp3.py walks MPEG audio frame headers.
Both are container-only by policy (no payload bitstream decode), so
the pins here are: muxer → parser bit-exact round trips, closed-form
agreement for every derived field, metadata probes, and the repo-wide
fuzz contract (malformed input raises only the codec's typed error).
"""

import struct

import numpy as np
import pytest

from lasutility_ray.geom.mp3 import (
    Mp3DataError,
    mp3_frames,
    mp3_metadata,
    write_mp3_frames,
)
from lasutility_ray.geom.mp4 import (
    Mp4DataError,
    mp4_sample_bytes,
    parse_mp4,
    write_mp4,
)


def _grd1_samples(n, w=8, h=8, seed=7):
    from lasutility_ray.stages.multimodal import HEADER, MAGIC

    rng = np.random.default_rng(seed)
    return [
        HEADER.pack(MAGIC, w, h, 1)
        + rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        for _ in range(n)
    ]


# ------------------------------------------------------------- MP4


def test_mp4_mux_parse_round_trip_fields():
    samples = _grd1_samples(9)
    blob = write_mp4(
        samples,
        codec="grd1",
        timescale=1000,
        sample_delta=40,
        width=8,
        height=8,
        keyframe_every=3,
        samples_per_chunk=4,
    )
    info = parse_mp4(blob)
    assert info.brand == "isom"
    assert info.timescale == 1000 and info.duration == 9 * 40
    t = info.video()
    assert t is not None and t.handler == "vide"
    assert t.codec == "grd1"
    assert t.width == 8 and t.height == 8
    assert t.timescale == 1000 and t.duration == 360
    assert t.n_samples == 9
    # stts expansion: dts = 0, 40, 80, ...
    assert np.array_equal(t.dts, np.arange(9) * 40)
    # stss: samples 1, 4, 7 (1-based) are sync
    assert np.array_equal(np.flatnonzero(t.keyframes), [0, 3, 6])
    # byte ranges recover every sample payload exactly
    for i, s in enumerate(samples):
        assert mp4_sample_bytes(blob, t, i) == s


def test_mp4_partial_last_chunk_offsets():
    """7 samples at 3 per chunk -> chunks of 3/3/1, a two-run stsc;
    per-sample offsets must still land on the exact payloads."""
    samples = [bytes([i]) * (10 + i) for i in range(7)]
    blob = write_mp4(samples, samples_per_chunk=3)
    t = parse_mp4(blob).video()
    assert t.n_samples == 7
    for i, s in enumerate(samples):
        assert mp4_sample_bytes(blob, t, i) == s
    # keyframe_every=1 writes no stss -> all sync
    assert t.keyframes.all()


def test_mp4_audio_track_round_trip():
    samples = [b"aac-frame-%d" % i for i in range(5)]
    blob = write_mp4(
        samples,
        codec="mp4a",
        handler="soun",
        timescale=44100,
        sample_delta=1024,
        channels=2,
        sample_rate=44100,
    )
    info = parse_mp4(blob)
    assert info.video() is None
    t = info.audio()
    assert t.handler == "soun" and t.codec == "mp4a"
    assert t.channels == 2 and t.sample_rate == 44100
    assert t.n_samples == 5
    assert mp4_sample_bytes(blob, t, 4) == samples[4]


def test_mp4_decode_video_grd1_payload():
    from lasutility_ray.stages.multimodal import decode_image_nd, decode_video

    samples = _grd1_samples(4)
    blob = write_mp4(samples, codec="grd1", width=8, height=8)
    frames = decode_video(blob)
    assert len(frames) == 4
    for f, s in zip(frames, samples):
        assert np.array_equal(f, decode_image_nd(s))


def test_mp4_decode_video_foreign_codec_is_honest_stub():
    from lasutility_ray.stages.multimodal import decode_video

    blob = write_mp4([b"\x00" * 32], codec="avc1", width=16, height=16)
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_video(blob)


def test_mp4_frame_sample_keeps_every_nth_keyframe():
    import pyarrow as pa

    from lasutility_ray.stages.multimodal import frame_sample

    samples = _grd1_samples(12)
    blob = write_mp4(
        samples, codec="grd1", width=8, height=8, keyframe_every=2, sample_delta=40
    )
    batch = pa.table({"video": pa.array([blob], pa.large_binary())})
    out = frame_sample(batch, every=3)
    sampled = parse_mp4(out.column("video")[0].as_py())
    t = sampled.video()
    # keyframes at 0,2,4,6,8,10; every 3rd -> 0, 6
    assert t.n_samples == 2
    assert mp4_sample_bytes(out.column("video")[0].as_py(), t, 0) == samples[0]
    assert mp4_sample_bytes(out.column("video")[0].as_py(), t, 1) == samples[6]
    # re-muxed file stays a conforming container (timescale preserved,
    # delta = keyframe stride in track time)
    assert t.timescale == 1000 and t.dts[1] - t.dts[0] == 240


def test_mp4_fuzz_truncation_and_bitflips_raise_typed_errors():
    blob = write_mp4(_grd1_samples(5), keyframe_every=2, samples_per_chunk=2)
    for cut in range(0, len(blob), 7):
        try:
            parse_mp4(blob[:cut])
        except (Mp4DataError, NotImplementedError):
            pass
    rng = np.random.default_rng(0)
    buf = bytearray(blob)
    for _ in range(300):
        i = int(rng.integers(len(buf)))
        old = buf[i]
        buf[i] ^= 1 << int(rng.integers(8))
        try:
            info = parse_mp4(bytes(buf))
            for t in info.tracks:
                if t.n_samples:
                    mp4_sample_bytes(bytes(buf), t, t.n_samples - 1)
        except (Mp4DataError, NotImplementedError):
            pass
        buf[i] = old


# ------------------------------------------------------------- MP3


@pytest.mark.parametrize(
    "version,layer,rate,samples",
    [
        (1, 3, 44100, 1152),
        (1, 2, 48000, 1152),
        (1, 1, 32000, 384),
        (2, 3, 22050, 576),
        (3, 3, 8000, 576),
    ],
)
def test_mp3_walker_across_versions_and_layers(version, layer, rate, samples):
    br = {1: 128, 2: 64, 3: 64}[version]
    if layer == 1:
        br = 128
    blob = write_mp3_frames(
        12, version=version, layer=layer, bitrate_kbps=br, sample_rate=rate
    )
    frames = mp3_frames(blob)
    assert len(frames) == 12
    assert all(f.version == version and f.layer == layer for f in frames)
    assert frames[0].samples == samples
    meta = mp3_metadata(blob)
    assert meta["n_frames"] == 12
    assert meta["duration_ms"] == 1000 * 12 * samples // rate
    assert not meta["vbr"]


def test_mp3_closed_form_frame_size_and_bitrate():
    """MPEG1 Layer III CBR: size = 144*br*1000//rate, avg bitrate
    floor-recovers the nominal rate — the q_media_metadata oracle's
    arithmetic."""
    for br in (96, 128, 192):
        blob = write_mp3_frames(10, bitrate_kbps=br)
        frames = mp3_frames(blob)
        s = 144 * br * 1000 // 44100
        assert all(f.size == s for f in frames)
        meta = mp3_metadata(blob)
        assert meta["avg_bitrate_kbps"] == (8 * s * 44100) // 1152000


def test_mp3_id3v2_prefix_and_id3v1_trailer_skipped():
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 5]) + b"x" * (128 + 5)
    blob = write_mp3_frames(6, id3v2=id3) + b"TAG" + b"\x00" * 125
    frames = mp3_frames(blob)
    assert len(frames) == 6
    assert frames[0].offset == len(id3)
    assert mp3_metadata(blob)["n_frames"] == 6


def test_mp3_xing_header_frame_excluded():
    blob = bytearray(write_mp3_frames(8, channels=1))
    xo = 4 + 17  # MPEG1 mono side-info offset
    blob[xo : xo + 4] = b"Xing"
    blob[xo + 4 : xo + 8] = struct.pack(">I", 1)  # flags: frames field
    blob[xo + 8 : xo + 12] = struct.pack(">I", 7)
    meta = mp3_metadata(bytes(blob))
    assert meta["n_frames"] == 7  # first frame is metadata, not audio
    assert meta["header_frames"] == 7
    assert meta["vbr"]


def test_mp3_mixed_sample_rates_rejected():
    a = write_mp3_frames(2, sample_rate=44100)
    b = write_mp3_frames(2, sample_rate=32000)
    with pytest.raises(Mp3DataError, match="mixed sample rates|lost frame sync"):
        mp3_metadata(a + b)


def test_mp3_fuzz_truncation_and_bitflips_raise_typed_errors():
    blob = write_mp3_frames(5)
    for cut in range(0, len(blob), 5):
        try:
            mp3_metadata(blob[:cut])
        except Mp3DataError:
            pass
    rng = np.random.default_rng(1)
    buf = bytearray(blob)
    for _ in range(300):
        i = int(rng.integers(len(buf)))
        old = buf[i]
        buf[i] ^= 1 << int(rng.integers(8))
        try:
            mp3_metadata(bytes(buf))
        except Mp3DataError:
            pass
        buf[i] = old


def test_decode_audio_mp3_is_honest_stub_pointing_at_metadata():
    from lasutility_ray.stages.multimodal import decode_audio

    with pytest.raises(NotImplementedError, match="media_metadata"):
        decode_audio(write_mp3_frames(3))


# ------------------------------------------------- probe_media + stage


def test_probe_media_dispatch_all_containers():
    from lasutility_ray.geom.gif import encode_gif
    from lasutility_ray.geom.png import encode_grey_png
    from lasutility_ray.stages.multimodal import probe_media, synth_audio_bytes

    p = probe_media(write_mp4(_grd1_samples(4), width=8, height=8))
    assert (p["container"], p["kind"], p["n_frames"]) == ("mp4", "video", 4)

    p = probe_media(write_mp3_frames(6))
    assert (p["container"], p["codec"], p["n_frames"]) == ("mp3", "mpeg1l3", 6)

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = probe_media(encode_grey_png(img))
    assert (p["container"], p["width"], p["height"]) == ("png", 8, 8)

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    gif = encode_gif([img, img, img], pal, delays=[5, 5, 5])
    p = probe_media(gif)
    assert (p["container"], p["n_frames"], p["duration_ms"]) == ("gif", 3, 150)
    assert (p["width"], p["height"]) == (8, 8)

    p = probe_media(synth_audio_bytes(np.array([3]))[0])
    assert (p["container"], p["sample_rate"], p["n_samples"]) == ("pcm1", 8000, 1024)

    with pytest.raises(ValueError, match="unrecognized"):
        probe_media(b"\x00" * 64)


def test_probe_media_jpeg_and_wav():
    from lasutility_ray.geom.jpeg import encode_jpeg
    from lasutility_ray.stages.multimodal import probe_media, synth_media_bytes

    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    p = probe_media(encode_jpeg(img, quality=80))
    assert (p["container"], p["codec"]) == ("jpeg", "baseline")
    assert (p["width"], p["height"], p["channels"]) == (16, 16, 1)

    (wav,) = synth_media_bytes(np.array([2]))
    p = probe_media(wav)
    assert (p["container"], p["codec"], p["channels"]) == ("wav", "pcm16", 1)
    assert p["n_samples"] == 544 and p["duration_ms"] == 68


def test_media_metadata_batch_matches_closed_forms():
    import pyarrow as pa

    from lasutility_ray.stages.multimodal import attach_media, media_metadata

    ids = np.arange(60, dtype=np.int64)
    batch = attach_media(pa.table({"doc_id": ids}))
    out = media_metadata(batch)
    assert "media" not in out.column_names
    df = out.to_pandas()
    for _, r in df.iterrows():
        d = int(r.doc_id)
        if d % 3 == 0:
            assert r.container == "mp4" and r.n_frames == 3 + d % 5
            assert r.duration_ms == (3 + d % 5) * 40
        elif d % 3 == 1:
            n = 20 + d % 7
            assert r.container == "mp3" and r.n_frames == n
            assert r.n_samples == n * 1152
            assert r.duration_ms == 1000 * n * 1152 // 44100
        else:
            n = 512 + 16 * (d % 4)
            assert r.container == "wav" and r.n_samples == n
            assert r.duration_ms == n // 8
