"""ISO Base Media File Format (MP4) container codec — from scratch
against the PUBLIC spec (ISO/IEC 14496-12 box structure; the box
layouts used here are all in the freely-published 2005 edition and
mirrored by the QuickTime File Format spec).

Scope is the CONTAINER, not the bitstream codecs: the parser walks
the box tree, decodes the sample tables (stsd/stts/stss/stsc/stsz/
stco/co64) and yields a fully-vectorized per-sample map — byte
ranges, decode timestamps, keyframe flags — which is exactly what a
distributed frame-sampling stage needs (pick every Nth keyframe,
fetch only those byte ranges). Decoding H.264/AAC payloads stays an
honest ``NotImplementedError`` (stages/multimodal.py policy: no
compiled codecs, no conformance bitstreams in the sandbox); the
repo's deterministic GRD1 fake codec stands in as the sample payload
for round-trip tests, so every container path is REAL and pinned.

The muxer writes a minimal conforming single-track progressive file
(ftyp + mdat + moov) with 32-bit tables; the parser accepts the
general form (64-bit sizes, co64, multi-track, interleaved chunks).

Reference parity: the reference repo has no media containers; this
extends the multimodal family (SURVEY §2 "beyond the reference").
No code or constants from any existing mp4 library — box fourccs and
field layouts are spec values.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np


class Mp4DataError(ValueError):
    """Malformed / truncated MP4 container."""


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in
    data[start:end]. Handles 64-bit largesize and size==0 (to end)."""
    off = start
    while off < end:
        if off + 8 > end:
            raise Mp4DataError("truncated box header")
        (size,) = struct.unpack_from(">I", data, off)
        fourcc = data[off + 4 : off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                raise Mp4DataError("truncated largesize box header")
            (size,) = struct.unpack_from(">Q", data, off + 8)
            body = off + 16
            if size < 16:
                raise Mp4DataError(f"invalid largesize {size}")
        elif size == 0:
            size = end - off
        elif size < 8:
            raise Mp4DataError(f"invalid box size {size}")
        box_end = off + size
        if box_end > end:
            raise Mp4DataError(f"box {fourcc!r} overruns container")
        yield fourcc, body, box_end
        off = box_end


def _child(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _iter_boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def _fullbox(data: bytes, body: int) -> tuple[int, int, int]:
    """Return (version, flags, payload_offset)."""
    if body + 4 > len(data):
        raise Mp4DataError("truncated full box")
    version = data[body]
    flags = int.from_bytes(data[body + 1 : body + 4], "big")
    return version, flags, body + 4


@dataclass
class Mp4Track:
    track_id: int
    handler: str  # 'vide' / 'soun' / other
    codec: str  # sample-entry fourcc
    timescale: int
    duration: int  # in track timescale units
    width: int = 0
    height: int = 0
    channels: int = 0
    sample_rate: int = 0
    # per-sample arrays (aligned, length n_samples)
    sizes: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    offsets: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    dts: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    keyframes: np.ndarray = field(default_factory=lambda: np.zeros(0, bool))

    @property
    def n_samples(self) -> int:
        return len(self.sizes)


@dataclass
class Mp4Info:
    brand: str
    timescale: int
    duration: int  # movie timescale units
    tracks: list[Mp4Track]

    @property
    def duration_ms(self) -> int:
        return 1000 * self.duration // self.timescale if self.timescale else 0

    def video(self) -> Mp4Track | None:
        for t in self.tracks:
            if t.handler == "vide":
                return t
        return None

    def audio(self) -> Mp4Track | None:
        for t in self.tracks:
            if t.handler == "soun":
                return t
        return None


def _parse_stbl(data: bytes, start: int, end: int, track: Mp4Track) -> None:
    stsd = _child(data, start, end, b"stsd")
    if stsd:
        _, _, p = _fullbox(data, stsd[0])
        (n_entries,) = struct.unpack_from(">I", data, p)
        if n_entries >= 1:
            # first sample entry: 4 size + 4 fourcc, then codec fields
            (esize,) = struct.unpack_from(">I", data, p + 4)
            if esize < 16 or p + 4 + esize > stsd[1]:
                raise Mp4DataError("bad stsd sample entry")
            track.codec = data[p + 8 : p + 12].decode("latin1")
            # sample entry body after fourcc: 6 reserved + 2 dri = 8
            eb = p + 12 + 8
            if track.handler == "vide" and esize >= 16 + 70:
                # VisualSampleEntry: pre_defined(2)+reserved(2)+pre_defined(12)
                # then width(2) height(2)
                track.width, track.height = struct.unpack_from(">HH", data, eb + 16)
            elif track.handler == "soun" and esize >= 16 + 20:
                # AudioSampleEntry: reserved(8) channelcount(2)
                # samplesize(2) pre_defined(2) reserved(2) samplerate(4, 16.16)
                track.channels = struct.unpack_from(">H", data, eb + 8)[0]
                track.sample_rate = struct.unpack_from(">I", data, eb + 16)[0] >> 16

    stsz = _child(data, start, end, b"stsz")
    if not stsz:
        raise Mp4DataError("stbl missing stsz")
    _, _, p = _fullbox(data, stsz[0])
    fixed, count = struct.unpack_from(">II", data, p)
    if fixed:
        sizes = np.full(count, fixed, np.int64)
    else:
        if p + 8 + 4 * count > stsz[1]:
            raise Mp4DataError("truncated stsz table")
        sizes = (
            np.frombuffer(data, dtype=">u4", count=count, offset=p + 8)
            .astype(np.int64)
        )
    n = int(count)

    # chunk offsets
    stco = _child(data, start, end, b"stco")
    co64 = _child(data, start, end, b"co64")
    if stco:
        _, _, p = _fullbox(data, stco[0])
        (nc,) = struct.unpack_from(">I", data, p)
        if p + 4 + 4 * nc > stco[1]:
            raise Mp4DataError("truncated stco table")
        chunk_off = np.frombuffer(data, dtype=">u4", count=nc, offset=p + 4).astype(
            np.int64
        )
    elif co64:
        _, _, p = _fullbox(data, co64[0])
        (nc,) = struct.unpack_from(">I", data, p)
        if p + 4 + 8 * nc > co64[1]:
            raise Mp4DataError("truncated co64 table")
        chunk_off = np.frombuffer(data, dtype=">u8", count=nc, offset=p + 4).astype(
            np.int64
        )
    else:
        raise Mp4DataError("stbl missing stco/co64")
    nc = len(chunk_off)

    # sample->chunk map: (first_chunk, samples_per_chunk, desc_idx) runs
    stsc = _child(data, start, end, b"stsc")
    if not stsc:
        raise Mp4DataError("stbl missing stsc")
    _, _, p = _fullbox(data, stsc[0])
    (nruns,) = struct.unpack_from(">I", data, p)
    if p + 4 + 12 * nruns > stsc[1]:
        raise Mp4DataError("truncated stsc table")
    runs = np.frombuffer(data, dtype=">u4", count=3 * nruns, offset=p + 4).reshape(
        nruns, 3
    ).astype(np.int64)
    # expand runs to per-chunk samples_per_chunk (vectorized repeat)
    if nruns:
        first = runs[:, 0] - 1  # 1-based -> 0-based
        if (first < 0).any() or (np.diff(first) <= 0).any() or first[0] != 0:
            raise Mp4DataError("non-canonical stsc first_chunk sequence")
        run_len = np.diff(np.append(first, nc))
        if (run_len < 0).any():
            raise Mp4DataError("stsc first_chunk beyond chunk count")
        spc = np.repeat(runs[:, 1], run_len)  # per-chunk sample count
    else:
        spc = np.zeros(0, np.int64)
    if int(spc.sum()) != n:
        raise Mp4DataError(
            f"stsc/stsz disagree: {int(spc.sum())} samples in chunks vs {n}"
        )

    # per-sample offset = chunk_offset[chunk] + cumsum of earlier
    # sample sizes within the chunk — all vectorized
    chunk_idx = np.repeat(np.arange(nc, dtype=np.int64), spc)
    cum = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    chunk_sample_start = np.concatenate(([0], np.cumsum(spc)[:-1]))
    within = cum - np.repeat(cum[chunk_sample_start], spc)
    track.offsets = chunk_off[chunk_idx] + within
    track.sizes = sizes

    # decode timestamps from stts delta runs
    stts = _child(data, start, end, b"stts")
    if not stts:
        raise Mp4DataError("stbl missing stts")
    _, _, p = _fullbox(data, stts[0])
    (ntt,) = struct.unpack_from(">I", data, p)
    if p + 4 + 8 * ntt > stts[1]:
        raise Mp4DataError("truncated stts table")
    tt = np.frombuffer(data, dtype=">u4", count=2 * ntt, offset=p + 4).reshape(
        ntt, 2
    ).astype(np.int64)
    deltas = np.repeat(tt[:, 1], tt[:, 0])
    if len(deltas) != n:
        raise Mp4DataError(f"stts covers {len(deltas)} samples, stsz says {n}")
    track.dts = np.concatenate(([0], np.cumsum(deltas)[:-1]))

    # keyframes: stss list, absent -> every sample is a sync sample
    stss = _child(data, start, end, b"stss")
    if stss:
        _, _, p = _fullbox(data, stss[0])
        (nk,) = struct.unpack_from(">I", data, p)
        if p + 4 + 4 * nk > stss[1]:
            raise Mp4DataError("truncated stss table")
        keys = np.frombuffer(data, dtype=">u4", count=nk, offset=p + 4).astype(
            np.int64
        )
        kf = np.zeros(n, bool)
        valid = (keys >= 1) & (keys <= n)
        kf[keys[valid] - 1] = True
        track.keyframes = kf
    else:
        track.keyframes = np.ones(n, bool)


def parse_mp4(data: bytes) -> Mp4Info:
    """Parse an ISO-BMFF container: brand, movie duration, and per
    track the codec fourcc + vectorized sample map (byte offsets,
    sizes, dts, keyframe flags). Raises :class:`Mp4DataError` on any
    malformed structure."""
    if len(data) < 12:
        raise Mp4DataError("too short for an MP4 container")
    brand = ""
    timescale = 0
    duration = 0
    tracks: list[Mp4Track] = []
    saw_moov = False
    for fc, b, e in _iter_boxes(data, 0, len(data)):
        if fc == b"ftyp":
            brand = data[b : b + 4].decode("latin1")
        elif fc == b"moov":
            saw_moov = True
            mvhd = _child(data, b, e, b"mvhd")
            if mvhd:
                v, _, p = _fullbox(data, mvhd[0])
                if v == 1:
                    timescale, duration = struct.unpack_from(">IQ", data, p + 16)
                else:
                    timescale, duration = struct.unpack_from(">II", data, p + 8)
            for tfc, tb, te in _iter_boxes(data, b, e):
                if tfc != b"trak":
                    continue
                tracks.append(_parse_trak(data, tb, te))
    if not saw_moov:
        raise Mp4DataError("no moov box (not an MP4 or streaming-only fragment)")
    return Mp4Info(brand, int(timescale), int(duration), tracks)


def _parse_trak(data: bytes, start: int, end: int) -> Mp4Track:
    track = Mp4Track(0, "", "", 0, 0)
    tkhd = _child(data, start, end, b"tkhd")
    if tkhd:
        v, _, p = _fullbox(data, tkhd[0])
        track.track_id = struct.unpack_from(">I", data, p + (16 if v else 8))[0]
    mdia = _child(data, start, end, b"mdia")
    if not mdia:
        raise Mp4DataError("trak missing mdia")
    mdhd = _child(data, mdia[0], mdia[1], b"mdhd")
    if mdhd:
        v, _, p = _fullbox(data, mdhd[0])
        if v == 1:
            ts, dur = struct.unpack_from(">IQ", data, p + 16)
        else:
            ts, dur = struct.unpack_from(">II", data, p + 8)
        track.timescale, track.duration = int(ts), int(dur)
    hdlr = _child(data, mdia[0], mdia[1], b"hdlr")
    if hdlr:
        _, _, p = _fullbox(data, hdlr[0])
        track.handler = data[p + 4 : p + 8].decode("latin1")
    minf = _child(data, mdia[0], mdia[1], b"minf")
    if not minf:
        raise Mp4DataError("mdia missing minf")
    stbl = _child(data, minf[0], minf[1], b"stbl")
    if not stbl:
        raise Mp4DataError("minf missing stbl")
    _parse_stbl(data, stbl[0], stbl[1], track)
    return track


def mp4_sample_bytes(data: bytes, track: Mp4Track, idx: int) -> bytes:
    """Extract one sample's payload by its byte range."""
    off = int(track.offsets[idx])
    size = int(track.sizes[idx])
    if off + size > len(data):
        raise Mp4DataError(f"sample {idx} range [{off},{off + size}) overruns file")
    return data[off : off + size]


# ------------------------------------------------------------- muxer


def _box(fourcc: bytes, *payload: bytes) -> bytes:
    body = b"".join(payload)
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, *payload: bytes) -> bytes:
    return _box(
        fourcc, bytes([version]) + flags.to_bytes(3, "big") + b"".join(payload)
    )


def write_mp4(
    samples: list[bytes],
    *,
    codec: str = "grd1",
    handler: str = "vide",
    timescale: int = 1000,
    sample_delta: int = 40,
    width: int = 0,
    height: int = 0,
    channels: int = 0,
    sample_rate: int = 0,
    keyframe_every: int = 1,
    samples_per_chunk: int = 4,
) -> bytes:
    """Mux raw sample payloads into a minimal conforming single-track
    progressive MP4 (ftyp + mdat + moov). Samples are laid out in
    chunks of ``samples_per_chunk``; every ``keyframe_every``-th
    sample is a sync sample (stss written iff != 1). The parser above
    round-trips every field bit-exactly (pinned in tests)."""
    if not samples:
        raise ValueError("write_mp4 needs at least one sample")
    n = len(samples)
    sizes = np.array([len(s) for s in samples], np.int64)

    # layout: ftyp, then mdat, then moov. Chunk = group of samples,
    # contiguous inside mdat.
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isom" + b"iso2")
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)
    mdat_payload_start = len(ftyp) + 8

    n_chunks = (n + samples_per_chunk - 1) // samples_per_chunk
    spc_full = np.full(n_chunks, samples_per_chunk, np.int64)
    spc_full[-1] = n - samples_per_chunk * (n_chunks - 1)
    cum_sizes = np.concatenate(([0], np.cumsum(sizes)))
    chunk_first_sample = np.arange(n_chunks) * samples_per_chunk
    chunk_offsets = mdat_payload_start + cum_sizes[chunk_first_sample]

    # stsc runs: one run while samples_per_chunk is constant
    runs = [(1, int(spc_full[0]), 1)]
    if n_chunks > 1 and spc_full[-1] != spc_full[0]:
        runs.append((n_chunks, int(spc_full[-1]), 1))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(runs)),
        b"".join(struct.pack(">III", *r) for r in runs),
    )
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n),
        sizes.astype(">u4").tobytes(),
    )
    stco = _full(
        b"stco",
        0,
        0,
        struct.pack(">I", n_chunks),
        chunk_offsets.astype(">u4").tobytes(),
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    boxes = [None, stts, stsc, stsz, stco]  # stsd filled below
    if keyframe_every != 1:
        keys = np.arange(0, n, keyframe_every, dtype=np.int64) + 1
        boxes.append(
            _full(
                b"stss",
                0,
                0,
                struct.pack(">I", len(keys)),
                keys.astype(">u4").tobytes(),
            )
        )

    fourcc = codec.encode("latin1")[:4].ljust(4, b" ")
    if handler == "vide":
        entry = _box(
            fourcc,
            b"\0" * 6 + struct.pack(">H", 1),  # reserved + data_ref_idx
            b"\0" * 16,  # pre_defined / reserved
            struct.pack(">HH", width, height),
            struct.pack(">II", 0x480000, 0x480000),  # 72 dpi
            b"\0" * 4,
            struct.pack(">H", 1),  # frame_count
            b"\0" * 32,  # compressorname
            struct.pack(">Hh", 24, -1),  # depth, pre_defined
        )
    else:
        entry = _box(
            fourcc,
            b"\0" * 6 + struct.pack(">H", 1),
            b"\0" * 8,
            struct.pack(">HHHH", channels, 16, 0, 0),
            struct.pack(">I", sample_rate << 16),
        )
    boxes[0] = _full(b"stsd", 0, 0, struct.pack(">I", 1), entry)
    stbl = _box(b"stbl", *boxes)

    duration = n * sample_delta
    header_name = b"VideoHandler\0" if handler == "vide" else b"SoundHandler\0"
    hdlr = _full(
        b"hdlr", 0, 0, b"\0" * 4, handler.encode("latin1"), b"\0" * 12, header_name
    )
    dinf = _box(
        b"dinf",
        _full(b"dref", 0, 0, struct.pack(">I", 1), _full(b"url ", 0, 1)),
    )
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, b"\0" * 8)
        if handler == "vide"
        else _full(b"smhd", 0, 0, b"\0" * 4),
        dinf,
        stbl,
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration),
        b"\0" * 8,
        struct.pack(">hhhh", 0, 0, 0 if handler == "vide" else 0x100, 0),
        struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd, mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">IH", 0x10000, 0x100),
        b"\0" * 10,
        struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        b"\0" * 24,
        struct.pack(">I", 2),  # next_track_id
    )
    moov = _box(b"moov", mvhd, trak)
    return ftyp + mdat + moov
