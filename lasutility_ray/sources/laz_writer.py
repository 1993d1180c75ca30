"""LAZ (compressed LAS) writer: POINT10 v2 (+ GPSTIME11 v2) items,
chunked compressor 2 — the exact scheme ``sources/laz.py`` reads.

The reference stubs its writer entirely (``LasUtility/LAS/
LasZipNetWriter.cs:7-9``); this module exceeds it with a from-scratch
encoder built from the public LASzip specification (laszip.org) and
Amir Said's public-domain FastAC coder — the byte-exact mirror of the
decoder in ``sources/laz.py`` (same models, same update cadence, same
integer-compressor corrector layout). Round-trip (write -> read) is
therefore bit-exact on coordinates/attributes, and the reference LAZ
fixture re-encodes to a stream our reader decodes identically
(tests/test_laz_writer.py).
"""

from __future__ import annotations

import struct

import numpy as np

from .laz import (
    _div2_trunc,
    _u8_clamp,
    _u8_fold,
    _NUMBER_RETURN_LEVEL,
    _NUMBER_RETURN_MAP,
    _GT_MULTI,
    _GT_MULTI_CODE_FULL,
    _GT_MULTI_MINUS,
    _GT_MULTI_TOTAL,
    _GT_MULTI_UNCHANGED,
    _BitModel,
    _Model,
    _StreamingMedian5,
    _i32,
)

U32 = 0xFFFFFFFF
AC_MAX_LENGTH = 0xFFFFFFFF
AC_MIN_LENGTH = 0x01000000
DM_LENGTH_SHIFT = 15
BM_LENGTH_SHIFT = 13


class _Encoder:
    """FastAC arithmetic encoder (laszip arithmeticencoder.cpp) —
    interval arithmetic mirrors _Decoder exactly, including the
    scale-then-multiply probability rounding."""

    def __init__(self):
        self.base = 0
        self.length = AC_MAX_LENGTH
        self.out = bytearray()

    # -- carry / renorm ------------------------------------------------

    def _propagate_carry(self):
        p = len(self.out) - 1
        while p >= 0 and self.out[p] == 0xFF:
            self.out[p] = 0
            p -= 1
        assert p >= 0, "carry out of buffer"
        self.out[p] += 1

    def _renorm(self):
        while True:
            self.out.append((self.base >> 24) & 0xFF)
            self.base = (self.base << 8) & U32
            self.length = (self.length << 8) & U32
            if self.length >= AC_MIN_LENGTH:
                break

    # -- coding --------------------------------------------------------

    def encode_bit(self, m: _BitModel, bit: int):
        x = m.bit_0_prob * (self.length >> BM_LENGTH_SHIFT)
        if bit == 0:
            self.length = x
            m.bit_0_count += 1
        else:
            init_base = self.base
            self.base = (self.base + x) & U32
            if init_base > self.base:
                self._propagate_carry()
            self.length -= x
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m._update()

    def encode_symbol(self, m: _Model, sym: int):
        init_base = self.base
        if sym == m.symbols - 1:
            x = m.distribution[sym] * (self.length >> DM_LENGTH_SHIFT)
            self.base = (self.base + x) & U32
            self.length -= x
        else:
            self.length >>= DM_LENGTH_SHIFT
            x = m.distribution[sym] * self.length
            self.base = (self.base + x) & U32
            self.length = m.distribution[sym + 1] * self.length - x
        if init_base > self.base:
            self._propagate_carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m._update()

    def write_bits(self, bits: int, sym: int):
        if bits > 19:
            self.write_short(sym & 0xFFFF)
            self.write_bits(bits - 16, sym >> 16)
            return
        init_base = self.base
        self.length >>= bits
        self.base = (self.base + sym * self.length) & U32
        if init_base > self.base:
            self._propagate_carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()

    def write_short(self, sym: int):
        init_base = self.base
        self.length >>= 16
        self.base = (self.base + sym * self.length) & U32
        if init_base > self.base:
            self._propagate_carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()

    def write_int(self, sym: int):
        self.write_short(sym & 0xFFFF)
        self.write_short((sym >> 16) & 0xFFFF)

    def done(self) -> bytes:
        init_base = self.base
        if self.length > (AC_MIN_LENGTH << 1):
            self.base = (self.base + AC_MIN_LENGTH) & U32
            self.length = AC_MIN_LENGTH >> 1  # final renorm emits 1 byte
            flushed = 1
        else:
            self.base = (self.base + (AC_MIN_LENGTH >> 1)) & U32
            self.length = AC_MIN_LENGTH >> 9  # final renorm emits 2 bytes
            flushed = 2
        if init_base > self.base:
            self._propagate_carry()
        self._renorm()
        # byte-sync: the decoder reads 4 bytes at init plus one per
        # renorm; its renorm count equals the encoder's (identical
        # interval evolution), so the stream must be exactly 4 bytes
        # longer than the in-coding renorm output for the NEXT chunk
        # to start at dec.off
        self.out.extend(b"\x00" * (4 - flushed))
        return bytes(self.out)


class _IntegerCompressor:
    """laszip integercompressor.cpp, compress side — model layout
    identical to _IntegerDecompressor."""

    BITS_HIGH = 8

    def __init__(self, enc: _Encoder, bits: int, contexts: int = 1):
        self.enc = enc
        self.contexts = contexts
        if bits and bits < 32:
            self.corr_bits = bits
            self.corr_range = 1 << bits
            self.corr_min = -(self.corr_range >> 1)
            self.corr_max = self.corr_min + self.corr_range - 1
        else:
            self.corr_bits = 32
            self.corr_range = 0
            self.corr_min = -(1 << 31)
            self.corr_max = (1 << 31) - 1
        self.k = 0
        self.m_bits = [_Model(self.corr_bits + 1) for _ in range(contexts)]
        self.m_corrector0 = _BitModel()
        self.m_corrector = [None]
        for i in range(1, min(self.corr_bits, 31) + 1):
            self.m_corrector.append(
                _Model(1 << i) if i <= self.BITS_HIGH else _Model(1 << self.BITS_HIGH)
            )

    def compress(self, pred: int, real: int, context: int = 0):
        corr = real - pred
        if self.corr_range:
            if corr < self.corr_min:
                corr += self.corr_range
            elif corr > self.corr_max:
                corr -= self.corr_range
        else:
            corr = _i32(corr)
        self._write_corrector(corr, self.m_bits[context])

    def _write_corrector(self, c: int, m_bits: _Model):
        enc = self.enc
        # tightest interval [-(2^k - 1), 2^k] containing c
        k = 0
        c1 = -c if c <= 0 else c - 1
        while c1:
            c1 >>= 1
            k += 1
        self.k = k
        enc.encode_symbol(m_bits, k)
        if k:
            if k < 32:
                if c < 0:
                    c += (1 << k) - 1
                else:
                    c -= 1
                if k <= self.BITS_HIGH:
                    enc.encode_symbol(self.m_corrector[k], c)
                else:
                    k1 = k - self.BITS_HIGH
                    lo = c & ((1 << k1) - 1)
                    enc.encode_symbol(self.m_corrector[k], c >> k1)
                    enc.write_bits(k1, lo)
        else:
            enc.encode_bit(self.m_corrector0, c)


# ------------------------------------------------ POINT10 v2 writer


class _Point10v2Writer:
    """laswriteitemcompressed_point10_v2 — state machine mirrors
    laz._Point10v2.read() move for move."""

    def __init__(self, enc: _Encoder, first: tuple):
        self.enc = enc
        (x, y, z, intensity, flags, classification, sar, user, psid) = first
        self.x, self.y, self.z = x, y, z
        self.intensity = 0  # v2 quirk, same as the reader
        self.flags = flags
        self.classification = classification
        self.scan_angle_rank = sar & 0xFF
        self.user_data = user
        self.point_source_id = psid

        self.m_changed_values = _Model(64)
        self.m_scan_angle_rank = [_Model(256), _Model(256)]
        self.m_bit_byte = [None] * 256
        self.m_classification = [None] * 256
        self.m_user_data = [None] * 256
        self.ic_intensity = _IntegerCompressor(enc, 16, 4)
        self.ic_point_source = _IntegerCompressor(enc, 16)
        self.ic_dx = _IntegerCompressor(enc, 32, 2)
        self.ic_dy = _IntegerCompressor(enc, 32, 22)
        self.ic_z = _IntegerCompressor(enc, 32, 20)
        self.last_x_diff_median5 = [_StreamingMedian5() for _ in range(16)]
        self.last_y_diff_median5 = [_StreamingMedian5() for _ in range(16)]
        self.last_intensity = [0] * 16
        self.last_height = [0] * 8

    def write(self, pt: tuple):
        enc = self.enc
        (x, y, z, intensity, flags, classification, sar, user, psid) = pt
        sar &= 0xFF

        r = flags & 7
        n = (flags >> 3) & 7
        m = _NUMBER_RETURN_MAP[n][r]
        l = _NUMBER_RETURN_LEVEL[n][r]

        changed = (
            ((flags != self.flags) << 5)
            | ((intensity != self.last_intensity[m]) << 4)
            | ((classification != self.classification) << 3)
            | ((sar != self.scan_angle_rank) << 2)
            | ((user != self.user_data) << 1)
            | (psid != self.point_source_id)
        )
        enc.encode_symbol(self.m_changed_values, changed)

        if changed & 32:
            if self.m_bit_byte[self.flags] is None:
                self.m_bit_byte[self.flags] = _Model(256)
            enc.encode_symbol(self.m_bit_byte[self.flags], flags)
            self.flags = flags
        if changed & 16:
            self.ic_intensity.compress(
                self.last_intensity[m], intensity, m if m < 3 else 3
            )
            self.last_intensity[m] = intensity
        if changed & 8:
            if self.m_classification[self.classification] is None:
                self.m_classification[self.classification] = _Model(256)
            enc.encode_symbol(self.m_classification[self.classification], classification)
            self.classification = classification
        if changed & 4:
            f = (self.flags >> 6) & 1
            enc.encode_symbol(
                self.m_scan_angle_rank[f], (sar - self.scan_angle_rank) & 0xFF
            )
            self.scan_angle_rank = sar
        if changed & 2:
            if self.m_user_data[self.user_data] is None:
                self.m_user_data[self.user_data] = _Model(256)
            enc.encode_symbol(self.m_user_data[self.user_data], user)
            self.user_data = user
        if changed & 1:
            self.ic_point_source.compress(self.point_source_id, psid)
            self.point_source_id = psid

        median = self.last_x_diff_median5[m].get()
        diff = _i32(x - self.x)
        self.ic_dx.compress(median, diff, 1 if n == 1 else 0)
        self.last_x_diff_median5[m].add(diff)
        self.x = x

        k_bits = self.ic_dx.k
        median = self.last_y_diff_median5[m].get()
        ctx = (1 if n == 1 else 0) + ((k_bits & ~1) if k_bits < 20 else 20)
        diff = _i32(y - self.y)
        self.ic_dy.compress(median, diff, ctx)
        self.last_y_diff_median5[m].add(diff)
        self.y = y

        k_bits = (self.ic_dx.k + self.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + ((k_bits & ~1) if k_bits < 18 else 18)
        self.ic_z.compress(self.last_height[l], z, ctx)
        self.last_height[l] = z
        self.z = z


# ------------------------------------------------ GPSTIME11 v2 writer


class _GpsTime11v2Writer:
    """laswriteitemcompressed_gpstime11_v2 — chooses the multi code
    the reader's state machine expects."""

    def __init__(self, enc: _Encoder, first_bits: int):
        self.enc = enc
        self.m_gpstime_multi = _Model(_GT_MULTI_TOTAL)
        self.m_gpstime_0diff = _Model(6)
        self.ic_gpstime = _IntegerCompressor(enc, 32, 9)
        self.last = 0
        self.next = 0
        self.last_gpstime = [first_bits, 0, 0, 0]
        self.last_gpstime_diff = [0, 0, 0, 0]
        self.multi_extreme_counter = [0, 0, 0, 0]

    def _u64(self, i: int) -> int:
        return self.last_gpstime[i] & 0xFFFFFFFFFFFFFFFF

    def write(self, bits: int):
        enc = self.enc
        if self.last_gpstime_diff[self.last] == 0:
            if bits == self.last_gpstime[self.last]:
                enc.encode_symbol(self.m_gpstime_0diff, 0)  # stays the same
                return
            # does the difference fit in 32 bits?
            diff64 = bits - self.last_gpstime[self.last]
            diff = _i32(diff64 & U32)
            if diff == diff64:
                enc.encode_symbol(self.m_gpstime_0diff, 1)
                self.ic_gpstime.compress(0, diff, 0)
                self.last_gpstime_diff[self.last] = diff
                self.last_gpstime[self.last] += diff
                self.multi_extreme_counter[self.last] = 0
                return
            # is it one of the other sequences?
            for i in range(1, 4):
                other = (self.last + i) & 3
                od64 = bits - self.last_gpstime[other]
                od = _i32(od64 & U32)
                if od == od64:
                    enc.encode_symbol(self.m_gpstime_0diff, i + 2)
                    self.last = other
                    self.write(bits)
                    return
            enc.encode_symbol(self.m_gpstime_0diff, 2)  # new full value
            self.ic_gpstime.compress(
                _i32(self._u64(self.last) >> 32), _i32((bits >> 32) & U32), 8
            )
            enc.write_int(bits & U32)
            self.next = (self.next + 1) & 3
            self.last_gpstime[self.next] = bits
            self.last = self.next
            self.last_gpstime_diff[self.last] = 0
            self.multi_extreme_counter[self.last] = 0
        else:
            if bits == self.last_gpstime[self.last]:
                enc.encode_symbol(self.m_gpstime_multi, _GT_MULTI_UNCHANGED)
                return
            diff64 = bits - self.last_gpstime[self.last]
            diff = _i32(diff64 & U32)
            if diff == diff64:
                # compute multiplier (rounded to nearest int)
                ld = self.last_gpstime_diff[self.last]
                multi_f = diff / ld
                multi = int(multi_f + 0.5) if multi_f >= 0 else -int(-multi_f + 0.5)
                if multi == 1:  # the most common case
                    enc.encode_symbol(self.m_gpstime_multi, 1)
                    self.ic_gpstime.compress(ld, diff, 1)
                    self.multi_extreme_counter[self.last] = 0
                elif multi > 0:
                    if multi < _GT_MULTI:
                        enc.encode_symbol(self.m_gpstime_multi, multi)
                        ctx = 2 if multi < 10 else 3
                        self.ic_gpstime.compress(_i32(multi * ld), diff, ctx)
                    else:
                        enc.encode_symbol(self.m_gpstime_multi, _GT_MULTI)
                        self.ic_gpstime.compress(_i32(_GT_MULTI * ld), diff, 4)
                        self.multi_extreme_counter[self.last] += 1
                        if self.multi_extreme_counter[self.last] > 3:
                            self.last_gpstime_diff[self.last] = diff
                            self.multi_extreme_counter[self.last] = 0
                elif multi < 0:
                    if multi > _GT_MULTI_MINUS:
                        enc.encode_symbol(self.m_gpstime_multi, _GT_MULTI - multi)
                        self.ic_gpstime.compress(_i32(multi * ld), diff, 5)
                    else:
                        enc.encode_symbol(
                            self.m_gpstime_multi, _GT_MULTI - _GT_MULTI_MINUS
                        )
                        self.ic_gpstime.compress(_i32(_GT_MULTI_MINUS * ld), diff, 6)
                        self.multi_extreme_counter[self.last] += 1
                        if self.multi_extreme_counter[self.last] > 3:
                            self.last_gpstime_diff[self.last] = diff
                            self.multi_extreme_counter[self.last] = 0
                else:  # multi == 0
                    enc.encode_symbol(self.m_gpstime_multi, 0)
                    self.ic_gpstime.compress(0, diff, 7)
                    self.multi_extreme_counter[self.last] += 1
                    if self.multi_extreme_counter[self.last] > 3:
                        self.last_gpstime_diff[self.last] = diff
                        self.multi_extreme_counter[self.last] = 0
                self.last_gpstime[self.last] += diff
            else:
                # does it belong to another sequence?
                for i in range(1, 4):
                    other = (self.last + i) & 3
                    od64 = bits - self.last_gpstime[other]
                    od = _i32(od64 & U32)
                    if od == od64:
                        enc.encode_symbol(
                            self.m_gpstime_multi, _GT_MULTI_CODE_FULL + i
                        )
                        self.last = other
                        self.write(bits)
                        return
                enc.encode_symbol(self.m_gpstime_multi, _GT_MULTI_CODE_FULL)
                self.ic_gpstime.compress(
                    _i32(self._u64(self.last) >> 32), _i32((bits >> 32) & U32), 8
                )
                enc.write_int(bits & U32)
                self.next = (self.next + 1) & 3
                self.last_gpstime[self.next] = bits
                self.last = self.next
                self.last_gpstime_diff[self.last] = 0
                self.multi_extreme_counter[self.last] = 0


# ------------------------------------------------ RGB12 v2 writer


class _Rgb12v2Writer:
    """laswriteitemcompressed_rgb12_v2 — mirror of laz._Rgb12v2."""

    def __init__(self, enc: _Encoder, raw: bytes):
        self.enc = enc
        self.r, self.g, self.b = struct.unpack("<HHH", raw)
        self.m_byte_used = _Model(128)
        self.m_diff = [_Model(256) for _ in range(6)]

    def write(self, r: int, g: int, b: int):
        enc = self.enc
        sym = 0
        if (r & 0xFF) != (self.r & 0xFF):
            sym |= 1
        if (r >> 8) != (self.r >> 8):
            sym |= 2
        if (
            ((r & 0x00FF) != (g & 0x00FF))
            or ((r & 0x00FF) != (b & 0x00FF))
            or ((r & 0xFF00) != (g & 0xFF00))
            or ((r & 0xFF00) != (b & 0xFF00))
        ):
            sym |= 1 << 6
            if (g & 0xFF) != (self.g & 0xFF):
                sym |= 1 << 2
            if (b & 0xFF) != (self.b & 0xFF):
                sym |= 1 << 4
            if (g >> 8) != (self.g >> 8):
                sym |= 1 << 3
            if (b >> 8) != (self.b >> 8):
                sym |= 1 << 5
        enc.encode_symbol(self.m_byte_used, sym)

        if sym & 1:
            enc.encode_symbol(self.m_diff[0], _u8_fold((r & 0xFF) - (self.r & 0xFF)))
        if sym & 2:
            enc.encode_symbol(self.m_diff[1], _u8_fold((r >> 8) - (self.r >> 8)))
        if sym & 64:
            diff = (r & 0xFF) - (self.r & 0xFF)
            if sym & 4:
                enc.encode_symbol(
                    self.m_diff[2],
                    _u8_fold((g & 0xFF) - _u8_clamp(diff + (self.g & 0xFF))),
                )
            if sym & 16:
                diff_b = _div2_trunc(diff + ((g & 0xFF) - (self.g & 0xFF)))
                enc.encode_symbol(
                    self.m_diff[4],
                    _u8_fold((b & 0xFF) - _u8_clamp(diff_b + (self.b & 0xFF))),
                )
            diff = (r >> 8) - (self.r >> 8)
            if sym & 8:
                enc.encode_symbol(
                    self.m_diff[3],
                    _u8_fold((g >> 8) - _u8_clamp(diff + (self.g >> 8))),
                )
            if sym & 32:
                diff_b = _div2_trunc(diff + ((g >> 8) - (self.g >> 8)))
                enc.encode_symbol(
                    self.m_diff[5],
                    _u8_fold((b >> 8) - _u8_clamp(diff_b + (self.b >> 8))),
                )
        self.r, self.g, self.b = r, g, b


# ---------------------------------------------------------- writer


DEFAULT_CHUNK_SIZE = 50000


def write_laz(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    classification: np.ndarray,
    intensity: np.ndarray | None = None,
    gps_time: np.ndarray | None = None,
    rgb: tuple | None = None,
    scale: float = 0.01,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> None:
    """Write a LAZ 1.2 file, compressor 2 (pointwise chunked),
    POINT10 v2 items (+ GPSTIME11 v2, + RGB12 v2). Point format:
    0 (bare), 1 (+gps), 2 (+rgb), 3 (+gps+rgb); ``rgb`` is a
    (red, green, blue) triple of uint16 arrays. Coordinates quantize
    at ``scale`` with offset floor(min) — lossless for values on the
    scale grid."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive (got {chunk_size})")
    n = len(x)
    has_gps = gps_time is not None
    has_rgb = rgb is not None
    pfmt = (1 if has_gps else 0) + (2 if has_rgb else 0)
    rec_len = 20 + (8 if has_gps else 0) + (6 if has_rgb else 0)
    if intensity is None:
        intensity = np.zeros(n, dtype=np.uint16)

    ox = float(np.floor(x.min())) if n else 0.0
    oy = float(np.floor(y.min())) if n else 0.0
    oz = float(np.floor(z.min())) if n else 0.0
    xi = np.round((x - ox) / scale).astype(np.int64).astype(np.int32)
    yi = np.round((y - oy) / scale).astype(np.int64).astype(np.int32)
    zi = np.round((z - oz) / scale).astype(np.int64).astype(np.int32)
    gbits = (
        np.frombuffer(np.asarray(gps_time, dtype="<f8").tobytes(), dtype="<i8")
        if has_gps
        else None
    )

    def raw_tuple(i: int) -> tuple:
        return (
            int(xi[i]),
            int(yi[i]),
            int(zi[i]),
            int(intensity[i]),
            0,  # flags: 1 return, return number 0 (matches reader fields)
            int(classification[i]),
            0,
            0,
            0,
        )

    # ---- compress chunks
    chunks: list[bytes] = []
    first_raws: list[bytes] = []
    done = 0
    while done < n:
        n_chunk = min(chunk_size, n - done)
        i0 = done
        first = raw_tuple(i0)
        raw = struct.pack("<iiiHBBbBH", *first)
        if has_gps:
            raw += struct.pack("<d", float(gps_time[i0]))
        rgb_raw = b""
        if has_rgb:
            rgb_raw = struct.pack(
                "<HHH", int(rgb[0][i0]), int(rgb[1][i0]), int(rgb[2][i0])
            )
            raw += rgb_raw
        first_raws.append(raw)
        enc = _Encoder()
        pt = _Point10v2Writer(enc, first)
        gt = _GpsTime11v2Writer(enc, int(gbits[i0])) if has_gps else None
        cb = _Rgb12v2Writer(enc, rgb_raw) if has_rgb else None
        for i in range(i0 + 1, i0 + n_chunk):
            pt.write(raw_tuple(i))
            if gt is not None:
                gt.write(int(gbits[i]))
            if cb is not None:
                cb.write(int(rgb[0][i]), int(rgb[1][i]), int(rgb[2][i]))
        chunks.append(enc.done())
        done += n_chunk

    # ---- laszip VLR payload (laszip spec layout: u16 compressor,
    # u16 coder, u8 ver_major, u8 ver_minor, u16 ver_rev, u32 options,
    # u32 chunk_size @12, i64 num_special_evlrs, i64 num_raw_points,
    # u16 num_items @32, then (type, size, version) triples)
    items = (
        [(6, 20, 2)]
        + ([(7, 8, 2)] if has_gps else [])
        + ([(8, 6, 2)] if has_rgb else [])
    )
    vlr_payload = struct.pack("<HH", 2, 0)
    vlr_payload += struct.pack("<BBH", 2, 2, 0)  # version major/minor/rev
    vlr_payload += struct.pack("<I", 0)  # options
    vlr_payload += struct.pack("<I", chunk_size)
    vlr_payload += struct.pack("<qq", 0, 0)  # num special/raw evlrs
    vlr_payload += struct.pack("<H", len(items))
    for t, sz, v in items:
        vlr_payload += struct.pack("<HHH", t, sz, v)

    vlr = (
        struct.pack("<H", 0)
        + b"laszip encoded\x00\x00"
        + struct.pack("<HH", 22204, len(vlr_payload))
        + b"\x00" * 32
        + vlr_payload
    )

    header_size = 227
    pdr_off = header_size + len(vlr)

    hdr = bytearray(header_size)
    hdr[0:4] = b"LASF"
    struct.pack_into("<BB", hdr, 24, 1, 2)  # version 1.2
    struct.pack_into("<H", hdr, 94, header_size)
    struct.pack_into("<I", hdr, 96, pdr_off)
    struct.pack_into("<I", hdr, 100, 1)  # n VLRs
    hdr[104] = pfmt | 0x80  # compressed flag
    struct.pack_into("<H", hdr, 105, rec_len)
    struct.pack_into("<I", hdr, 107, n)
    struct.pack_into("<3d", hdr, 131, scale, scale, scale)
    struct.pack_into("<3d", hdr, 155, ox, oy, oz)
    if n:
        struct.pack_into(
            "<6d",
            hdr,
            179,
            float(x.max()),
            float(x.min()),
            float(y.max()),
            float(y.min()),
            float(z.max()),
            float(z.min()),
        )

    # ---- compressed chunk table (laszip spec: i64 absolute table
    # offset at the start of the point data; at that offset
    # u32 version(0) + u32 number_chunks, then one arithmetic stream
    # where IntegerCompressor(32, contexts=2) codes each chunk's byte
    # size in context 1, predicted from the previous chunk's raw
    # size — the format our reader pinned against the reference's
    # golden Q5232E1_cropped.laz). The table is what makes the file
    # seekable: laz_read_units() fans one decode task out per chunk.
    chunk_bytes = [len(raw) + len(comp) for raw, comp in zip(first_raws, chunks)]
    table_off = pdr_off + 8 + sum(chunk_bytes)
    tenc = _Encoder()
    tic = _IntegerCompressor(tenc, 32, 2)
    prev = 0
    for nbytes in chunk_bytes:
        tic.compress(prev, nbytes, 1)
        prev = nbytes
    table = struct.pack("<II", 0, len(chunk_bytes)) + (
        tenc.done() if chunk_bytes else b""
    )

    with open(path, "wb") as f:
        f.write(hdr)
        f.write(vlr)
        f.write(struct.pack("<q", table_off))
        for raw, comp in zip(first_raws, chunks):
            f.write(raw)
            f.write(comp)
        f.write(table)


def write_laz_tiles(points_ds, out_dir: str, scale: float = 0.01,
                    point_format: int = 0):
    """Distributed LAZ sink: one compressed ``{tile_id}.laz`` per 1 km
    tile (partitioned, resumable-shaped output — the S2 surface at the
    Ray layer, exceeding the reference's stubbed writer). Expects the
    engine's points schema (tile_id, x, y, z, classification, and
    optionally is_ground/doc_id ignored). ``point_format`` 0 writes
    legacy POINT10 tiles (compressor 2); 6 writes LAS 1.4 POINT14
    tiles through the layered compressor-3 codec (``laz14.py``).
    Returns a (tile_id, path, n_points) manifest Dataset; consume it
    to drive the writes."""
    import os

    import pandas as pd

    if point_format not in (0, 6):
        raise ValueError(f"point_format must be 0 or 6 (got {point_format})")
    os.makedirs(out_dir, exist_ok=True)

    def write_tile(g: pd.DataFrame) -> pd.DataFrame:
        tile_id = g["tile_id"].iloc[0]
        path = os.path.join(out_dir, f"{tile_id}.laz")
        tmp = f"{path}.tmp.{os.getpid()}"
        if point_format == 6:
            from .laz14 import write_laz14

            write_laz14(
                tmp,
                g["x"].to_numpy(),
                g["y"].to_numpy(),
                g["z"].to_numpy(),
                classification=g["classification"].to_numpy(),
                scale=scale,
            )
        else:
            write_laz(
                tmp,
                g["x"].to_numpy(),
                g["y"].to_numpy(),
                g["z"].to_numpy(),
                g["classification"].to_numpy(),
                scale=scale,
            )
        os.replace(tmp, path)
        return pd.DataFrame(
            {"tile_id": [tile_id], "path": [path], "n_points": [len(g)]}
        )

    return points_ds.groupby("tile_id").map_groups(write_tile, batch_format="pandas")
