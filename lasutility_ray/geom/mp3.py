"""MPEG audio (MP3) frame-header walker — from scratch against the
PUBLIC header layout of ISO/IEC 11172-3 / 13818-3 (the 4-byte frame
header, bitrate/samplerate index tables and frame-length formulas are
all in the freely-documented spec summary; no decoder code reused).

Scope: CONTAINER/METADATA only. Walking the frame sequence yields
per-frame byte ranges, the stream's version/layer/mode, exact frame
count, average bitrate and duration — everything a corpus pipeline
needs to profile, filter or slice audio documents WITHOUT decoding.
Full Layer-III synthesis (huffman tables + polyphase filterbank)
stays an honest ``NotImplementedError`` in decode_audio: its ~2000
empirical table constants can't be conformance-checked offline
(stages/multimodal.py policy).

Handles: MPEG1/2/2.5, Layers I/II/III, ID3v2 prefix (syncsafe size),
ID3v1 trailer, Xing/Info and VBRI VBR headers (frame/byte counts),
free-format rejection, padding. Fuzz contract: malformed input
raises only :class:`Mp3DataError`.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


class Mp3DataError(ValueError):
    """Malformed / truncated MP3 stream."""


# bitrate tables in kbps, index 1..14 (0 = free format, 15 = invalid)
_BITRATES = {
    # (version_group, layer): 14 entries
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_RATES = {
    1: [44100, 48000, 32000],  # MPEG1
    2: [22050, 24000, 16000],  # MPEG2
    3: [11025, 12000, 8000],  # MPEG2.5
}
_VERSION_BITS = {0b00: 3, 0b10: 2, 0b11: 1}  # header bits -> version (2.5 as 3)


@dataclass
class Mp3Frame:
    offset: int
    size: int
    version: int  # 1, 2, or 3 (=2.5)
    layer: int  # 1..3
    bitrate_kbps: int
    sample_rate: int
    channels: int
    samples: int  # PCM samples this frame contributes per channel


def _parse_header(data: bytes, off: int) -> Mp3Frame | None:
    """Decode the 4-byte header at off; None if not a valid frame
    sync."""
    if off + 4 > len(data):
        return None
    h = struct.unpack_from(">I", data, off)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (h >> 19) & 3
    if vbits == 0b01:
        return None  # reserved version
    version = _VERSION_BITS[vbits]
    lbits = (h >> 17) & 3
    if lbits == 0:
        return None  # reserved layer
    layer = 4 - lbits
    br_idx = (h >> 12) & 0xF
    if br_idx in (0, 15):
        return None  # free format unsupported / invalid
    sr_idx = (h >> 10) & 3
    if sr_idx == 3:
        return None
    vgroup = 1 if version == 1 else 2
    bitrate = _BITRATES[(vgroup, layer)][br_idx - 1]
    rate = _RATES[version][sr_idx]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        size = (12 * bitrate * 1000 // rate + padding) * 4
        samples = 384
    elif layer == 2:
        size = 144 * bitrate * 1000 // rate + padding
        samples = 1152
    else:  # layer III
        if version == 1:
            size = 144 * bitrate * 1000 // rate + padding
            samples = 1152
        else:
            size = 72 * bitrate * 1000 // rate + padding
            samples = 576
    return Mp3Frame(off, size, version, layer, bitrate, rate, channels, samples)


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise Mp3DataError("ID3v2 size bytes not syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    footer = 10 if (data[5] & 0x10) else 0
    return 10 + size + footer


def mp3_frames(data: bytes, max_frames: int | None = None) -> list[Mp3Frame]:
    """Walk every frame in the stream (after an optional ID3v2 tag,
    before an optional ID3v1 trailer). Strict once locked: after the
    first valid frame, the next header must start exactly where the
    previous frame ends (garbage mid-stream raises — this is a
    metadata contract, not a salvage decoder)."""
    end = len(data)
    if data[-128:][:3] == b"TAG":
        end -= 128
    off = _skip_id3v2(data)
    if off > end:
        raise Mp3DataError("ID3v2 tag overruns file")
    # resync scan for the first frame (tolerate leading junk <= 4 KiB,
    # the conventional reader allowance)
    first = None
    limit = min(off + 4096, end)
    while off < limit:
        f = _parse_header(data, off)
        if f is not None and off + f.size <= end:
            # require the NEXT header (if room) to also parse — the
            # standard false-sync rejection
            nxt = _parse_header(data, off + f.size)
            if off + f.size >= end or nxt is not None:
                first = f
                break
        off += 1
    if first is None:
        raise Mp3DataError("no MPEG audio frame sync found")
    frames = [first]
    off = first.offset + first.size
    while off < end:
        if max_frames is not None and len(frames) >= max_frames:
            break
        f = _parse_header(data, off)
        if f is None:
            raise Mp3DataError(f"lost frame sync at byte {off}")
        if off + f.size > end:
            raise Mp3DataError(f"frame at {off} truncated")
        frames.append(f)
        off += f.size
    return frames


def _xing_offset(f: Mp3Frame) -> int:
    """Side-info size after the 4-byte header (no CRC): where a
    Xing/Info tag sits in the first frame."""
    if f.version == 1:
        return 4 + (17 if f.channels == 1 else 32)
    return 4 + (9 if f.channels == 1 else 17)


def mp3_metadata(data: bytes) -> dict:
    """Stream metadata without decoding: exact frame count, duration,
    average bitrate, VBR detection (Xing/Info/VBRI header or varying
    frame bitrates)."""
    frames = mp3_frames(data)
    f0 = frames[0]
    vbr_header_frames = None
    xo = f0.offset + _xing_offset(f0)
    tag = data[xo : xo + 4]
    if tag in (b"Xing", b"Info"):
        (flags,) = struct.unpack_from(">I", data, xo + 4)
        if flags & 1:
            (vbr_header_frames,) = struct.unpack_from(">I", data, xo + 8)
    elif data[f0.offset + 4 + 32 : f0.offset + 4 + 36] == b"VBRI":
        (vbr_header_frames,) = struct.unpack_from(
            ">I", data, f0.offset + 4 + 32 + 14
        )
    # a Xing/Info/VBRI frame is metadata, not audio: exclude it
    audio = frames[1:] if (tag in (b"Xing", b"Info") or vbr_header_frames) else frames
    if not audio:
        audio = frames
    rates = {f.sample_rate for f in audio}
    if len(rates) > 1:
        raise Mp3DataError(f"mixed sample rates in one stream: {sorted(rates)}")
    n_samples = sum(f.samples for f in audio)
    duration_ms = 1000 * n_samples // f0.sample_rate
    total_bytes = sum(f.size for f in audio)
    avg_kbps = (
        8 * total_bytes * f0.sample_rate // (n_samples * 1000) if n_samples else 0
    )
    bitrates = {f.bitrate_kbps for f in audio}
    return {
        "version": f0.version,
        "layer": f0.layer,
        "sample_rate": f0.sample_rate,
        "channels": f0.channels,
        "n_frames": len(audio),
        "n_samples": n_samples,
        "duration_ms": duration_ms,
        "avg_bitrate_kbps": avg_kbps,
        "vbr": len(bitrates) > 1 or vbr_header_frames is not None,
        "header_frames": vbr_header_frames,
    }


def write_mp3_frames(
    n_frames: int,
    *,
    version: int = 1,
    layer: int = 3,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    fill: int = 0x55,
    id3v2: bytes | None = None,
) -> bytes:
    """Synthesize a structurally-valid CBR stream (correct headers +
    deterministic filler payload — NOT decodable audio; the sandbox
    has no conforming encoder). Exists so the walker has pinned
    fixtures covering every version/layer/rate combination."""
    vgroup = 1 if version == 1 else 2
    try:
        br_idx = _BITRATES[(vgroup, layer)].index(bitrate_kbps) + 1
        sr_idx = _RATES[version][: 3].index(sample_rate)
    except ValueError as exc:
        raise ValueError(f"invalid bitrate/rate for MPEG{version} L{layer}") from exc
    vbits = {1: 0b11, 2: 0b10, 3: 0b00}[version]
    lbits = 4 - layer
    mode = 3 if channels == 1 else 0
    h = (
        (0x7FF << 21)
        | (vbits << 19)
        | (lbits << 17)
        | (1 << 16)  # no CRC
        | (br_idx << 12)
        | (sr_idx << 10)
        | (0 << 9)  # no padding
        | (mode << 6)
    )
    header = struct.pack(">I", h)
    probe = _parse_header(header + b"\0" * 4, 0)
    frame = header + bytes([fill]) * (probe.size - 4)
    out = (id3v2 or b"") + frame * n_frames
    return out
