"""From-scratch LAS/LAZ point reader (S1) — public formats only.

- LAS 1.x header + uncompressed point formats 0/1.
- LAZ (LASzip) decompression for the scheme the reference fixture
  uses: compressor 2 (pointwise chunked), arithmetic coder 0 (the
  public-domain FastAC coder by Amir Said), items POINT10 v2 +
  GPSTIME11 v2 — i.e. the laszip.org specification (the reference
  consumes it through LasZipNetStandard, ``LAS/LasZipNetReader.cs``).

Validated against the reference's ``Q5232E1_cropped.laz`` fixture:
the decoded, dequantized point set must equal the vertex set of the
golden ``DEM.shp`` triangulation exactly
(tests/test_reference_golden.py).
"""

from __future__ import annotations

import struct

import numpy as np

U32 = 0xFFFFFFFF
AC_MIN_LENGTH = 0x01000000
DM_LENGTH_SHIFT = 15
DM_MAX_COUNT = 1 << DM_LENGTH_SHIFT
BM_LENGTH_SHIFT = 13
BM_MAX_COUNT = 1 << BM_LENGTH_SHIFT


# ------------------------------------------------------ entropy coder


class _Model:
    """FastAC adaptive symbol model (decode side; the decoder lookup
    table is an optimization we skip — the binary search below is
    bit-exact with or without it)."""

    __slots__ = ("symbols", "symbol_count", "distribution", "total_count",
                 "update_cycle", "symbols_until_update")

    def __init__(self, symbols: int):
        self.symbols = symbols
        self.symbol_count = [1] * symbols
        self.distribution = [0] * symbols
        self.total_count = 0
        self.update_cycle = symbols
        self._update()
        self.update_cycle = (symbols + 6) >> 1
        self.symbols_until_update = self.update_cycle

    def _update(self):
        self.total_count += self.update_cycle
        if self.total_count > DM_MAX_COUNT:
            self.total_count = 0
            for n in range(self.symbols):
                self.symbol_count[n] = (self.symbol_count[n] + 1) >> 1
                self.total_count += self.symbol_count[n]
        scale = 0x80000000 // self.total_count
        s = 0
        dist = self.distribution
        cnt = self.symbol_count
        for k in range(self.symbols):
            dist[k] = (scale * s) >> (31 - DM_LENGTH_SHIFT)
            s += cnt[k]
        self.update_cycle = (5 * self.update_cycle) >> 2
        max_cycle = (self.symbols + 6) << 3
        if self.update_cycle > max_cycle:
            self.update_cycle = max_cycle
        self.symbols_until_update = self.update_cycle


class _BitModel:
    __slots__ = ("bit_0_prob", "bit_0_count", "bit_count", "update_cycle",
                 "bits_until_update")

    def __init__(self):
        self.bit_0_count = 1
        self.bit_count = 2
        self.bit_0_prob = 1 << (BM_LENGTH_SHIFT - 1)
        self.update_cycle = self.bits_until_update = 4

    def _update(self):
        self.bit_count += self.update_cycle
        if self.bit_count > BM_MAX_COUNT:
            self.bit_count = (self.bit_count + 1) >> 1
            self.bit_0_count = (self.bit_0_count + 1) >> 1
            if self.bit_0_count == self.bit_count:
                self.bit_count += 1
        # FastAC's exact rounding: scale first, then multiply (NOT a
        # single division — the ±1 difference drifts the interval)
        scale = 0x80000000 // self.bit_count
        self.bit_0_prob = (self.bit_0_count * scale) >> (31 - BM_LENGTH_SHIFT)
        self.update_cycle = min((5 * self.update_cycle) >> 2, 64)
        self.bits_until_update = self.update_cycle


class _Decoder:
    """FastAC arithmetic decoder (laszip arithmeticdecoder.cpp)."""

    def __init__(self, data: bytes, off: int):
        self.data = data
        self.off = off
        self.length = U32
        v = 0
        for _ in range(4):
            v = (v << 8) | data[self.off]
            self.off += 1
        self.value = v

    def _renorm(self):
        data = self.data
        while True:
            self.value = ((self.value << 8) | data[self.off]) & U32
            self.off += 1
            self.length = (self.length << 8) & U32
            if self.length >= AC_MIN_LENGTH:
                break

    def decode_bit(self, m: _BitModel) -> int:
        x = m.bit_0_prob * (self.length >> BM_LENGTH_SHIFT)
        if self.value < x:
            sym = 0
            self.length = x
            m.bit_0_count += 1
        else:
            sym = 1
            self.value -= x
            self.length -= x
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m._update()
        return sym

    def decode_symbol(self, m: _Model) -> int:
        y = self.length
        x = sym = 0
        self.length >>= DM_LENGTH_SHIFT
        n = m.symbols
        k = n >> 1
        dist = m.distribution
        value = self.value
        length = self.length
        while True:
            z = length * dist[k]
            if z > value:
                n = k
                y = z
            else:
                sym = k
                x = z
            k = (sym + n) >> 1
            if k == sym:
                break
        self.value = value - x
        self.length = y - x
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m._update()
        return sym

    def read_bits(self, bits: int) -> int:
        if bits > 19:
            lo = self.read_short()
            hi = self.read_bits(bits - 16)
            return (hi << 16) | lo
        self.length >>= bits
        sym = self.value // self.length
        self.value -= self.length * sym
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_short(self) -> int:
        self.length >>= 16
        sym = self.value // self.length
        self.value -= self.length * sym
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_int(self) -> int:
        lo = self.read_short()
        hi = self.read_short()
        return (hi << 16) | lo


# ------------------------------------------- integer compressor


def _i32(v: int) -> int:
    v &= U32
    return v - (1 << 32) if v >= (1 << 31) else v


class _IntegerDecompressor:
    """laszip integercompressor.cpp, decompress side (bits=16/32)."""

    BITS_HIGH = 8

    def __init__(self, dec: _Decoder, bits: int, contexts: int = 1):
        self.dec = dec
        self.contexts = contexts
        if bits and bits < 32:
            self.corr_bits = bits
            self.corr_range = 1 << bits
            self.corr_min = -(self.corr_range >> 1)
        else:
            self.corr_bits = 32
            self.corr_range = 0
            self.corr_min = -(1 << 31)
        self.k = 0
        self.m_bits = [_Model(self.corr_bits + 1) for _ in range(contexts)]
        self.m_corrector0 = _BitModel()
        # models for k = 1 .. corr_bits (k == 32 is the corr_min
        # special case and never uses a model)
        self.m_corrector = [None]
        for i in range(1, min(self.corr_bits, 31) + 1):
            self.m_corrector.append(
                _Model(1 << i) if i <= self.BITS_HIGH else _Model(1 << self.BITS_HIGH)
            )

    def decompress(self, pred: int, context: int = 0) -> int:
        dec = self.dec
        k = dec.decode_symbol(self.m_bits[context])
        self.k = k
        if k:
            if k < 32:
                if k <= self.BITS_HIGH:
                    c = dec.decode_symbol(self.m_corrector[k])
                else:
                    k1 = k - self.BITS_HIGH
                    c = dec.decode_symbol(self.m_corrector[k])
                    c1 = dec.read_bits(k1)
                    c = (c << k1) | c1
                if c >= (1 << (k - 1)):
                    c += 1
                else:
                    c -= (1 << k) - 1
            else:
                c = self.corr_min
        else:
            c = dec.decode_bit(self.m_corrector0)
        real = pred + c
        if self.corr_range:
            if real < 0:
                real += self.corr_range
            elif real >= self.corr_range:
                real -= self.corr_range
        else:
            real = _i32(real)
        return real


# ------------------------------------------------ POINT10 v2 item


_NUMBER_RETURN_MAP = [
    [15, 14, 13, 12, 11, 10, 9, 8],
    [14, 0, 1, 3, 6, 10, 10, 9],
    [13, 1, 2, 4, 7, 11, 11, 10],
    [12, 3, 4, 5, 8, 12, 12, 11],
    [11, 6, 7, 8, 9, 13, 13, 12],
    [10, 10, 11, 12, 13, 14, 14, 13],
    [9, 10, 11, 12, 13, 14, 15, 14],
    [8, 9, 10, 11, 12, 13, 14, 15],
]
_NUMBER_RETURN_LEVEL = [
    [0, 1, 2, 3, 4, 5, 6, 7],
    [1, 0, 1, 2, 3, 4, 5, 6],
    [2, 1, 0, 1, 2, 3, 4, 5],
    [3, 2, 1, 0, 1, 2, 3, 4],
    [4, 3, 2, 1, 0, 1, 2, 3],
    [5, 4, 3, 2, 1, 0, 1, 2],
    [6, 5, 4, 3, 2, 1, 0, 1],
    [7, 6, 5, 4, 3, 2, 1, 0],
]


class _StreamingMedian5:
    __slots__ = ("values", "high")

    def __init__(self):
        self.values = [0, 0, 0, 0, 0]
        self.high = True

    def add(self, v: int):
        vals = self.values
        if self.high:
            if v < vals[2]:
                vals[4] = vals[3]
                vals[3] = vals[2]
                if v < vals[0]:
                    vals[2] = vals[1]
                    vals[1] = vals[0]
                    vals[0] = v
                elif v < vals[1]:
                    vals[2] = vals[1]
                    vals[1] = v
                else:
                    vals[2] = v
            else:
                if v < vals[3]:
                    vals[4] = vals[3]
                    vals[3] = v
                else:
                    vals[4] = v
                self.high = False
        else:
            if vals[2] < v:
                vals[0] = vals[1]
                vals[1] = vals[2]
                if vals[4] < v:
                    vals[2] = vals[3]
                    vals[3] = vals[4]
                    vals[4] = v
                elif vals[3] < v:
                    vals[2] = vals[3]
                    vals[3] = v
                else:
                    vals[2] = v
            else:
                if vals[1] < v:
                    vals[0] = vals[1]
                    vals[1] = v
                else:
                    vals[0] = v
                self.high = True

    def get(self) -> int:
        return self.values[2]


class _Point10v2:
    """lasreaditemcompressed_point10_v2."""

    def __init__(self, dec: _Decoder, raw: bytes):
        self.dec = dec
        (x, y, z, intensity, flags, classification, sar, user, psid) = struct.unpack(
            "<iiiHBBbBH", raw
        )
        self.x, self.y, self.z = x, y, z
        self.intensity = 0  # v2 quirk: last intensity starts at 0
        self.flags = flags
        self.classification = classification
        self.scan_angle_rank = sar & 0xFF
        self.user_data = user
        self.point_source_id = psid
        self.first = (x, y, z, intensity, flags, classification, sar, user, psid)

        self.m_changed_values = _Model(64)
        self.m_scan_angle_rank = [_Model(256), _Model(256)]
        self.m_bit_byte = [None] * 256
        self.m_classification = [None] * 256
        self.m_user_data = [None] * 256
        self.ic_intensity = _IntegerDecompressor(dec, 16, 4)
        self.ic_point_source = _IntegerDecompressor(dec, 16)
        self.ic_dx = _IntegerDecompressor(dec, 32, 2)
        self.ic_dy = _IntegerDecompressor(dec, 32, 22)
        self.ic_z = _IntegerDecompressor(dec, 32, 20)
        self.last_x_diff_median5 = [_StreamingMedian5() for _ in range(16)]
        self.last_y_diff_median5 = [_StreamingMedian5() for _ in range(16)]
        self.last_intensity = [0] * 16
        self.last_height = [0] * 8

    def read(self):
        dec = self.dec
        changed = dec.decode_symbol(self.m_changed_values)
        if changed & 32:
            if self.m_bit_byte[self.flags] is None:
                self.m_bit_byte[self.flags] = _Model(256)
            self.flags = dec.decode_symbol(self.m_bit_byte[self.flags])

        r = self.flags & 7
        n = (self.flags >> 3) & 7
        m = _NUMBER_RETURN_MAP[n][r]
        l = _NUMBER_RETURN_LEVEL[n][r]

        if changed:
            if changed & 16:
                self.last_intensity[m] = self.ic_intensity.decompress(
                    self.last_intensity[m], m if m < 3 else 3
                )
            self.intensity = self.last_intensity[m]
            if changed & 8:
                if self.m_classification[self.classification] is None:
                    self.m_classification[self.classification] = _Model(256)
                self.classification = dec.decode_symbol(
                    self.m_classification[self.classification]
                )
            if changed & 4:
                f = (self.flags >> 6) & 1
                val = dec.decode_symbol(self.m_scan_angle_rank[f])
                self.scan_angle_rank = (val + self.scan_angle_rank) & 0xFF
            if changed & 2:
                if self.m_user_data[self.user_data] is None:
                    self.m_user_data[self.user_data] = _Model(256)
                self.user_data = dec.decode_symbol(self.m_user_data[self.user_data])
            if changed & 1:
                self.point_source_id = self.ic_point_source.decompress(
                    self.point_source_id
                )
        else:
            self.intensity = self.last_intensity[m]

        median = self.last_x_diff_median5[m].get()
        diff = self.ic_dx.decompress(median, 1 if n == 1 else 0)
        self.x = _i32(self.x + diff)
        self.last_x_diff_median5[m].add(diff)

        k_bits = self.ic_dx.k
        median = self.last_y_diff_median5[m].get()
        ctx = (1 if n == 1 else 0) + ((k_bits & ~1) if k_bits < 20 else 20)
        diff = self.ic_dy.decompress(median, ctx)
        self.y = _i32(self.y + diff)
        self.last_y_diff_median5[m].add(diff)

        k_bits = (self.ic_dx.k + self.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + ((k_bits & ~1) if k_bits < 18 else 18)
        self.z = self.ic_z.decompress(self.last_height[l], ctx)
        self.last_height[l] = self.z


# ------------------------------------------------ GPSTIME11 v2 item

_GT_MULTI = 500
_GT_MULTI_MINUS = -10
_GT_MULTI_UNCHANGED = _GT_MULTI - _GT_MULTI_MINUS + 1  # 511
_GT_MULTI_CODE_FULL = _GT_MULTI - _GT_MULTI_MINUS + 2  # 512
_GT_MULTI_TOTAL = _GT_MULTI - _GT_MULTI_MINUS + 6  # 516


class _GpsTime11v2:
    def __init__(self, dec: _Decoder, raw: bytes):
        self.dec = dec
        (t,) = struct.unpack("<d", raw)
        (bits,) = struct.unpack("<q", raw)
        self.m_gpstime_multi = _Model(_GT_MULTI_TOTAL)
        self.m_gpstime_0diff = _Model(6)
        self.ic_gpstime = _IntegerDecompressor(dec, 32, 9)
        self.last = 0
        self.next = 0
        self.last_gpstime = [bits, 0, 0, 0]  # i64 bit patterns
        self.last_gpstime_diff = [0, 0, 0, 0]
        self.multi_extreme_counter = [0, 0, 0, 0]

    def _u64(self, i: int) -> int:
        return self.last_gpstime[i] & 0xFFFFFFFFFFFFFFFF

    def read(self):
        dec = self.dec
        if self.last_gpstime_diff[self.last] == 0:
            multi = dec.decode_symbol(self.m_gpstime_0diff)
            if multi == 1:  # the difference fits in 32 bits
                d = self.ic_gpstime.decompress(0, 0)
                self.last_gpstime_diff[self.last] = d
                self.last_gpstime[self.last] += d
                self.multi_extreme_counter[self.last] = 0
            elif multi == 2:  # a new full value
                self.next = (self.next + 1) & 3
                hi = self.ic_gpstime.decompress(
                    _i32(self._u64(self.last) >> 32), 8
                )
                v = ((hi & U32) << 32) | dec.read_int()
                self.last_gpstime[self.next] = v - (1 << 64) if v >= (1 << 63) else v
                self.last = self.next
                self.last_gpstime_diff[self.last] = 0
                self.multi_extreme_counter[self.last] = 0
            elif multi > 2:  # switch to another sequence
                self.last = (self.last + multi - 2) & 3
                self.read()
        else:
            multi = dec.decode_symbol(self.m_gpstime_multi)
            if multi == 1:
                self.last_gpstime[self.last] += self.ic_gpstime.decompress(
                    self.last_gpstime_diff[self.last], 1
                )
                self.multi_extreme_counter[self.last] = 0
            elif multi < _GT_MULTI_UNCHANGED:
                if multi == 0:
                    d = self.ic_gpstime.decompress(0, 7)
                    self.multi_extreme_counter[self.last] += 1
                    if self.multi_extreme_counter[self.last] > 3:
                        self.last_gpstime_diff[self.last] = d
                        self.multi_extreme_counter[self.last] = 0
                elif multi < _GT_MULTI:
                    ctx = 2 if multi < 10 else 3
                    d = self.ic_gpstime.decompress(
                        _i32(multi * self.last_gpstime_diff[self.last]), ctx
                    )
                elif multi == _GT_MULTI:
                    d = self.ic_gpstime.decompress(
                        _i32(_GT_MULTI * self.last_gpstime_diff[self.last]), 4
                    )
                    self.multi_extreme_counter[self.last] += 1
                    if self.multi_extreme_counter[self.last] > 3:
                        self.last_gpstime_diff[self.last] = d
                        self.multi_extreme_counter[self.last] = 0
                else:
                    mneg = _GT_MULTI - multi  # in [-10 .. -1]
                    if mneg > _GT_MULTI_MINUS:
                        d = self.ic_gpstime.decompress(
                            _i32(mneg * self.last_gpstime_diff[self.last]), 5
                        )
                    else:
                        d = self.ic_gpstime.decompress(
                            _i32(_GT_MULTI_MINUS * self.last_gpstime_diff[self.last]), 6
                        )
                        self.multi_extreme_counter[self.last] += 1
                        if self.multi_extreme_counter[self.last] > 3:
                            self.last_gpstime_diff[self.last] = d
                            self.multi_extreme_counter[self.last] = 0
                self.last_gpstime[self.last] += d
            elif multi == _GT_MULTI_CODE_FULL:
                self.next = (self.next + 1) & 3
                hi = self.ic_gpstime.decompress(_i32(self._u64(self.last) >> 32), 8)
                v = ((hi & U32) << 32) | dec.read_int()
                self.last_gpstime[self.next] = v - (1 << 64) if v >= (1 << 63) else v
                self.last = self.next
                self.last_gpstime_diff[self.last] = 0
                self.multi_extreme_counter[self.last] = 0
            elif multi > _GT_MULTI_CODE_FULL:
                self.last = (self.last + multi - _GT_MULTI_CODE_FULL) & 3
                self.read()
            # multi == _GT_MULTI_UNCHANGED: time stays the same

    @property
    def value(self) -> float:
        return struct.unpack("<d", struct.pack("<q", self.last_gpstime[self.last]))[0]


# ------------------------------------------------ RGB12 v2 item


def _typed_laz_errors(fn):
    """Malformed LAS/LAZ bytes must surface as ValueError (the
    reader's data error), never bare struct.error / IndexError from
    whichever parse step tripped first — fuzz-pinned."""
    import functools

    @functools.wraps(fn)
    def wrap(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (ValueError, NotImplementedError, EOFError, OSError):
            raise
        except (struct.error, IndexError, KeyError, OverflowError) as exc:
            raise ValueError(f"malformed LAS/LAZ stream: {exc}") from exc

    return wrap


def _u8_fold(n: int) -> int:
    return n & 0xFF


def _u8_clamp(n: int) -> int:
    return 0 if n < 0 else (255 if n > 255 else n)


def _div2_trunc(n: int) -> int:
    """C integer division by 2 (truncates toward zero; python //
    floors negatives)."""
    return n // 2 if n >= 0 else -((-n) // 2)


class _Rgb12v2:
    """lasreaditemcompressed_rgb12_v2 (laszip spec): per-byte diff
    coding with a 7-bit used mask; green/blue predict from red's
    deltas."""

    def __init__(self, dec: _Decoder, raw: bytes):
        self.dec = dec
        self.r, self.g, self.b = struct.unpack("<HHH", raw)
        self.m_byte_used = _Model(128)
        self.m_diff = [_Model(256) for _ in range(6)]

    def read(self):
        dec = self.dec
        sym = dec.decode_symbol(self.m_byte_used)
        if sym & 1:
            corr = dec.decode_symbol(self.m_diff[0])
            r_lo = _u8_fold(corr + (self.r & 0xFF))
        else:
            r_lo = self.r & 0xFF
        if sym & 2:
            corr = dec.decode_symbol(self.m_diff[1])
            r_hi = _u8_fold(corr + (self.r >> 8))
        else:
            r_hi = self.r >> 8
        r = r_lo | (r_hi << 8)

        if sym & 64:
            diff = r_lo - (self.r & 0xFF)
            if sym & 4:
                corr = dec.decode_symbol(self.m_diff[2])
                g_lo = _u8_fold(corr + _u8_clamp(diff + (self.g & 0xFF)))
            else:
                g_lo = self.g & 0xFF
            if sym & 16:
                corr = dec.decode_symbol(self.m_diff[4])
                diff_b = _div2_trunc(diff + (g_lo - (self.g & 0xFF)))
                b_lo = _u8_fold(corr + _u8_clamp(diff_b + (self.b & 0xFF)))
            else:
                b_lo = self.b & 0xFF
            diff = r_hi - (self.r >> 8)
            if sym & 8:
                corr = dec.decode_symbol(self.m_diff[3])
                g_hi = _u8_fold(corr + _u8_clamp(diff + (self.g >> 8)))
            else:
                g_hi = self.g >> 8
            if sym & 32:
                corr = dec.decode_symbol(self.m_diff[5])
                diff_b = _div2_trunc(diff + (g_hi - (self.g >> 8)))
                b_hi = _u8_fold(corr + _u8_clamp(diff_b + (self.b >> 8)))
            else:
                b_hi = self.b >> 8
            g = g_lo | (g_hi << 8)
            b = b_lo | (b_hi << 8)
        else:
            g = r
            b = r
        self.r, self.g, self.b = r, g, b


# ---------------------------------------------------------- reader


def _parse_laszip_vlr(laszip_vlr: bytes):
    """Validate the laszip VLR payload against what this codec
    implements (compressor 2 pointwise-chunked, coder 0 arithmetic,
    POINT10/GPSTIME11/RGB12 v2 items) and return
    ``(has_gps, has_rgb, chunk_size)``; ``chunk_size`` is -1 for
    variable-size chunking (U32_MAX in the VLR read as ``<i``)."""
    compressor, coder = struct.unpack_from("<HH", laszip_vlr, 0)
    (chunk_size,) = struct.unpack_from("<i", laszip_vlr, 12)
    (n_items,) = struct.unpack_from("<H", laszip_vlr, 32)
    items = [struct.unpack_from("<HHH", laszip_vlr, 34 + 6 * j) for j in range(n_items)]
    if compressor != 2 or coder != 0:
        raise NotImplementedError(f"laszip compressor {compressor}/coder {coder}")
    for t, _sz, v in items:
        if (t, v) not in ((6, 2), (7, 2), (8, 2)):
            raise NotImplementedError(f"laszip item type {t} v{v}")
    if chunk_size != -1 and chunk_size <= 0:
        raise NotImplementedError(f"invalid laszip chunk size {chunk_size}")
    has_gps = any(t == 7 for t, _s, _v in items)
    has_rgb = any(t == 8 for t, _s, _v in items)
    return has_gps, has_rgb, chunk_size


def _parse_chunk_table_blob(blob: bytes, variable: bool):
    """Decode a chunk-table blob (starting at the ``u32 version`` word)
    into ``(counts, sizes)``; ``counts`` is None for fixed chunking."""
    version, nch = struct.unpack_from("<II", blob, 0)
    if version != 0:
        raise NotImplementedError(f"laszip chunk table version {version}")
    if nch == 0:
        return ([] if variable else None, [])
    dec = _Decoder(blob, 8)
    ic = _IntegerDecompressor(dec, 32, 2)
    counts = [] if variable else None
    sizes = []
    pc = ps = 0
    for _ in range(nch):
        if variable:
            pc = ic.decompress(pc, 0)
            counts.append(pc)
        ps = ic.decompress(ps, 1)
        sizes.append(ps)
    return (counts, sizes)


def _read_chunk_table(data: bytes, pdr_off: int, variable: bool):
    """Parse the laszip compressed chunk table (format pinned against
    the reference's golden ``Q5232E1_cropped.laz``: its table decodes
    to exactly the byte span between chunks-start and table-start).

    Layout per the laszip.org spec: an i64 table offset at the start
    of the point data; at that offset ``u32 version (=0)`` +
    ``u32 number_chunks``, then one arithmetic stream in which
    ``IntegerCompressor(bits=32, contexts=2)`` codes, per chunk, the
    point count (context 0, variable-size chunking only) and the byte
    size (context 1), each predicted from the previous chunk's raw
    value.

    Returns ``(counts, sizes)`` — ``counts`` is None for fixed
    chunking — or None when the stream carries no table (offset -1 or
    out of range, e.g. our own pre-round-2 writer output)."""
    (cts,) = struct.unpack_from("<q", data, pdr_off)
    if cts <= 0 or cts + 8 > len(data):
        return None
    try:
        return _parse_chunk_table_blob(data[cts:], variable)
    except (IndexError, struct.error):
        # corrupt / layout-inconsistent table (e.g. a fixed-chunking
        # table in a stream whose VLR claims variable chunking): the
        # table is only an optimization — fall back to sequential
        return None


def _decode_chunk(data: bytes, off: int, n_chunk: int, has_gps: bool, has_rgb: bool):
    """Decode one laszip chunk (raw seed point + arithmetic stream)
    starting at ``off``. Chunks are independent streams, so this is
    the unit of parallelism for large files. Returns (raw_records,
    end_offset) where each record is the normalized
    [p10:20][gps:8][rgb:6?] layout."""
    raw_pts = []
    p10 = data[off : off + 20]
    off += 20
    gps_raw = b"\0" * 8
    if has_gps:
        gps_raw = data[off : off + 8]
        off += 8
    rgb_raw = b""
    if has_rgb:
        rgb_raw = data[off : off + 6]
        off += 6
    raw_pts.append(p10 + gps_raw + rgb_raw)
    dec = _Decoder(data, off)
    pt = _Point10v2(dec, p10)
    gt = _GpsTime11v2(dec, gps_raw) if has_gps else None
    cb = _Rgb12v2(dec, rgb_raw) if has_rgb else None
    for _ in range(n_chunk - 1):
        pt.read()
        if gt is not None:
            gt.read()
        if cb is not None:
            cb.read()
        raw_pts.append(
            struct.pack(
                "<iiiHBBbBH",
                pt.x,
                pt.y,
                pt.z,
                pt.intensity,
                pt.flags,
                pt.classification,
                pt.scan_angle_rank - 256 if pt.scan_angle_rank >= 128 else pt.scan_angle_rank,
                pt.user_data,
                pt.point_source_id,
            )
            + struct.pack("<d", gt.value if gt is not None else 0.0)
            + (struct.pack("<HHH", cb.r, cb.g, cb.b) if cb is not None else b"")
        )
    return raw_pts, dec.off


def _raw_pts_to_arrays(raw_pts, sx, sy, sz, ox, oy, oz):
    """Normalized raw records -> dequantized column arrays. Records
    are fixed-length per file, so the unpack is one vectorized
    ``np.frombuffer`` over the joined blob (no per-point loop)."""
    n = len(raw_pts)
    if n == 0:
        z16 = np.zeros(0, np.uint16)
        return {
            "x": np.zeros(0, np.float64),
            "y": np.zeros(0, np.float64),
            "z": np.zeros(0, np.float64),
            "classification": np.zeros(0, np.uint8),
            "intensity": z16,
            "gps_time": np.zeros(0, np.float64),
            "red": z16,
            "green": z16,
            "blue": z16,
            "n_points": 0,
        }
    itemsize = len(raw_pts[0])
    names = ["X", "Y", "Z", "inten", "cls", "gps"]
    formats = ["<i4", "<i4", "<i4", "<u2", "u1", "<f8"]
    offsets = [0, 4, 8, 12, 15, 20]
    has_rgb = itemsize >= 34
    if has_rgb:
        names += ["red", "green", "blue"]
        formats += ["<u2", "<u2", "<u2"]
        offsets += [28, 30, 32]
    dt = np.dtype(
        {"names": names, "formats": formats, "offsets": offsets, "itemsize": itemsize}
    )
    arr = np.frombuffer(b"".join(raw_pts), dtype=dt)
    z16 = np.zeros(n, np.uint16)
    return {
        "x": arr["X"].astype(np.int64) * sx + ox,
        "y": arr["Y"].astype(np.int64) * sy + oy,
        "z": arr["Z"].astype(np.int64) * sz + oz,
        "classification": arr["cls"].copy(),
        "intensity": arr["inten"].copy(),
        "gps_time": arr["gps"].copy(),
        "red": arr["red"].copy() if has_rgb else z16,
        "green": arr["green"].copy() if has_rgb else z16,
        "blue": arr["blue"].copy() if has_rgb else z16,
        "n_points": n,
    }


def _plain_arrays(
    data: bytes, offset: int, count: int, pfmt: int, rec_len: int,
    sx: float, sy: float, sz: float, ox: float, oy: float, oz: float,
):
    """Uncompressed point records -> dequantized column arrays, one
    vectorized structured-dtype view over the record block (no
    per-record loop). Handles the legacy POINT0-3 layout and the LAS
    1.4 POINT14 family (formats 6/7/8)."""
    if pfmt >= 6:
        names = ["X", "Y", "Z", "inten", "cls", "gps"]
        formats = ["<i4", "<i4", "<i4", "<u2", "u1", "<f8"]
        offsets = [0, 4, 8, 12, 16, 22]
        has_gps = True
        has_rgb = pfmt >= 7
        rgb_off = 30
    else:
        names = ["X", "Y", "Z", "inten", "cls"]
        formats = ["<i4", "<i4", "<i4", "<u2", "u1"]
        offsets = [0, 4, 8, 12, 15]
        has_gps = pfmt in (1, 3)
        if has_gps:
            names += ["gps"]
            formats += ["<f8"]
            offsets += [20]
        has_rgb = pfmt in (2, 3)
        rgb_off = 20 if pfmt == 2 else 28
    if has_rgb:
        names += ["red", "green", "blue"]
        formats += ["<u2", "<u2", "<u2"]
        offsets += [rgb_off, rgb_off + 2, rgb_off + 4]
    dt = np.dtype(
        {"names": names, "formats": formats, "offsets": offsets, "itemsize": rec_len}
    )
    arr = np.frombuffer(data, dtype=dt, count=count, offset=offset)
    z16 = np.zeros(count, np.uint16)
    return {
        "x": arr["X"].astype(np.int64) * sx + ox,
        "y": arr["Y"].astype(np.int64) * sy + oy,
        "z": arr["Z"].astype(np.int64) * sz + oz,
        "classification": arr["cls"].copy(),
        "intensity": arr["inten"].copy(),
        "gps_time": arr["gps"].copy() if has_gps else np.zeros(count, np.float64),
        "red": arr["red"].copy() if has_rgb else z16,
        "green": arr["green"].copy() if has_rgb else z16,
        "blue": arr["blue"].copy() if has_rgb else z16,
        "n_points": count,
    }


@_typed_laz_errors
def read_laz_points(path: str):
    """Read a LAS or LAZ file -> dict of numpy arrays {x, y, z,
    classification, intensity, gps_time} (dequantized doubles).
    LAZ support covers the laszip POINT10 v2 (+ GPSTIME11 v2) scheme."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"LASF":
        raise ValueError("not a LAS/LAZ file")
    (hdr_size,) = struct.unpack_from("<H", data, 94)
    (pdr_off,) = struct.unpack_from("<I", data, 96)
    (n_vlr,) = struct.unpack_from("<I", data, 100)
    pfmt_raw = data[104]
    (rec_len,) = struct.unpack_from("<H", data, 105)
    (npoints,) = struct.unpack_from("<I", data, 107)
    sx, sy, sz = struct.unpack_from("<3d", data, 131)
    ox, oy, oz = struct.unpack_from("<3d", data, 155)
    compressed = bool(pfmt_raw & 0x80)
    pfmt = pfmt_raw & 0x7F

    laszip_vlr = None
    off = hdr_size
    for _ in range(n_vlr):
        (rid, rlen) = struct.unpack_from("<HH", data, off + 18)
        if rid == 22204:
            laszip_vlr = data[off + 54 : off + 54 + rlen]
        off += 54 + rlen

    if pfmt not in (0, 1, 2, 3, 6, 7, 8):
        raise NotImplementedError(f"point format {pfmt}")

    # LAS 1.4: the legacy u32 count is 0 for point formats 6+ (and for
    # files over 2^32 points); the real u64 count lives at offset 247
    if data[25] >= 4 and hdr_size >= 255:
        (n64,) = struct.unpack_from("<Q", data, 247)
        if npoints == 0 and n64:
            npoints = n64

    if not compressed:
        return _plain_arrays(data, pdr_off, npoints, pfmt, rec_len, sx, sy, sz, ox, oy, oz)

    if laszip_vlr is None:
        raise ValueError("compressed LAZ without laszip VLR")
    if pfmt >= 6:
        # POINT14-family (LAS 1.4 formats 6/7/8): layered compressor 3
        # (see laz14.py for the fidelity contract; reference analogue:
        # LasZipNetReader.cs delegates to the LASzip codec)
        from .laz14 import read_laz14_points

        return read_laz14_points(
            data, pdr_off, npoints, laszip_vlr, sx, sy, sz, ox, oy, oz
        )
    has_gps, has_rgb, chunk_size = _parse_laszip_vlr(laszip_vlr)

    variable = chunk_size == -1
    table = _read_chunk_table(data, pdr_off, variable)
    if variable:
        # variable-size chunking: counts come from the chunk table;
        # with no table (our own pre-chunk-table writer output, or a
        # stream truncated before its table) the only valid layout is
        # one chunk of all points
        counts = (
            table[0]
            if table is not None and table[0] and sum(table[0]) == npoints
            else [npoints]
        )
    else:
        counts = None

    raw_pts = []
    off = pdr_off + 8  # skip chunk table offset
    done = 0
    ci = 0
    while done < npoints:
        n_chunk = counts[ci] if counts is not None else min(chunk_size, npoints - done)
        n_chunk = min(n_chunk, npoints - done)
        if n_chunk <= 0:
            raise ValueError(f"laszip chunk table: non-positive chunk count {n_chunk}")
        chunk_raws, off = _decode_chunk(data, off, n_chunk, has_gps, has_rgb)
        raw_pts.extend(chunk_raws)
        done += n_chunk
        ci += 1
    return _raw_pts_to_arrays(raw_pts, sx, sy, sz, ox, oy, oz)


TARGET_UNIT_BYTES = 128 << 20  # ~one object-store block per plain-LAS unit


@_typed_laz_errors
def laz_read_units(path: str, target_unit_bytes: int = TARGET_UNIT_BYTES) -> list[dict]:
    """Split one LAS/LAZ file into independently-decodable work units
    for the Ray reader. A LAZ chunk is a self-contained arithmetic
    stream, so a file whose compressed chunk table is present splits
    into one unit per chunk; a supported uncompressed LAS splits into
    ~``target_unit_bytes`` record ranges (``pfmt >= 0`` units). In
    both cases the worker does a single ranged read, no header parse.
    Everything else (table-less streams, unsupported formats) is one
    whole-file unit with ``offset == -1``. Planning reads only the
    header, VLRs and the trailing table — never the point data."""
    whole = [
        {
            "path": path, "offset": -1, "length": -1, "count": -1,
            "pfmt": -1, "rec_len": 0,
            "sx": 0.0, "sy": 0.0, "sz": 0.0, "ox": 0.0, "oy": 0.0, "oz": 0.0,
            "has_gps": False, "has_rgb": False, "fmt14": 0,
        }
    ]
    with open(path, "rb") as f:
        hdr = f.read(375)
        if hdr[:4] != b"LASF":
            raise ValueError(f"not a LAS/LAZ file: {path}")
        (hdr_size,) = struct.unpack_from("<H", hdr, 94)
        (pdr_off,) = struct.unpack_from("<I", hdr, 96)
        (n_vlr,) = struct.unpack_from("<I", hdr, 100)
        pfmt_raw = hdr[104]
        (rec_len,) = struct.unpack_from("<H", hdr, 105)
        (npoints,) = struct.unpack_from("<I", hdr, 107)
        sx, sy, sz = struct.unpack_from("<3d", hdr, 131)
        ox, oy, oz = struct.unpack_from("<3d", hdr, 155)
        if hdr[25] >= 4 and hdr_size >= 255:
            (n64,) = struct.unpack_from("<Q", hdr, 247)
            if npoints == 0 and n64:
                npoints = n64
        if not (pfmt_raw & 0x80):
            # plain LAS: record-range units (supported formats only)
            pfmt = pfmt_raw & 0x7F
            if pfmt not in (0, 1, 2, 3, 6, 7, 8) or npoints == 0 or rec_len == 0:
                return whole
            per_unit = max(1, target_unit_bytes // rec_len)
            units = []
            done = 0
            while done < npoints:
                cnt = min(per_unit, npoints - done)
                units.append(
                    {
                        "path": path, "offset": pdr_off + done * rec_len,
                        "length": cnt * rec_len, "count": cnt,
                        "pfmt": pfmt, "rec_len": rec_len,
                        "sx": sx, "sy": sy, "sz": sz,
                        "ox": ox, "oy": oy, "oz": oz,
                        "has_gps": False, "has_rgb": False, "fmt14": 0,
                    }
                )
                done += cnt
            return units
        if npoints == 0:
            return whole
        f.seek(hdr_size)
        laszip_vlr = None
        for _ in range(n_vlr):
            vh = f.read(54)
            rid, rlen = struct.unpack_from("<HH", vh, 18)
            payload = f.read(rlen)
            if rid == 22204:
                laszip_vlr = payload
        if laszip_vlr is None:
            return whole
        fmt14 = 0
        try:
            has_gps, has_rgb, chunk_size = _parse_laszip_vlr(laszip_vlr)
        except NotImplementedError:
            try:
                # layered compressor 3 (formats 6+): chunks are still
                # independently decodable, so the same per-chunk fanout
                # applies — the unit carries the point format instead
                # of the v2 item flags
                from .laz14 import parse_laszip_vlr14

                fmt14, chunk_size = parse_laszip_vlr14(laszip_vlr)
                has_gps = has_rgb = False
            except NotImplementedError:
                # let the whole-file decode raise the precise message
                return whole
        f.seek(pdr_off)
        (cts,) = struct.unpack("<q", f.read(8))
        fsize = f.seek(0, 2)
        if cts <= 0 or cts + 8 > fsize:
            return whole
        f.seek(cts)
        try:
            counts, sizes = _parse_chunk_table_blob(f.read(), chunk_size == -1)
        except (IndexError, struct.error):
            return whole
    units = []
    off = pdr_off + 8
    done = 0
    for k, nbytes in enumerate(sizes):
        cnt = counts[k] if counts is not None else min(chunk_size, npoints - done)
        units.append(
            {
                "path": path, "offset": off, "length": nbytes, "count": cnt,
                "pfmt": -1, "rec_len": 0,
                "sx": sx, "sy": sy, "sz": sz, "ox": ox, "oy": oy, "oz": oz,
                "has_gps": has_gps, "has_rgb": has_rgb, "fmt14": fmt14,
            }
        )
        off += nbytes
        done += cnt
    if done != npoints or not units:
        return whole  # inconsistent table: fall back to sequential decode
    return units


@_typed_laz_errors
def read_laz_chunk_points(unit: dict):
    """Decode one ``laz_read_units`` work unit -> the same column-array
    dict ``read_laz_points`` returns. Whole-file units delegate; plain
    record-range units (``pfmt >= 0``) and LAZ chunk units do one
    ranged read and decode it in isolation."""
    if unit["offset"] < 0:
        return read_laz_points(unit["path"])
    with open(unit["path"], "rb") as f:
        f.seek(unit["offset"])
        data = f.read(unit["length"])
    if unit["pfmt"] >= 0:
        return _plain_arrays(
            data, 0, unit["count"], unit["pfmt"], unit["rec_len"],
            unit["sx"], unit["sy"], unit["sz"], unit["ox"], unit["oy"], unit["oz"],
        )
    if unit.get("fmt14", 0) >= 6:
        from .laz14 import decode_chunk14, rec_len14

        recs, _end = decode_chunk14(data, 0, unit["count"], unit["fmt14"])
        return _plain_arrays(
            b"".join(recs), 0, unit["count"], unit["fmt14"],
            rec_len14(unit["fmt14"]),
            unit["sx"], unit["sy"], unit["sz"], unit["ox"], unit["oy"], unit["oz"],
        )
    raw_pts, _end = _decode_chunk(data, 0, unit["count"], unit["has_gps"], unit["has_rgb"])
    return _raw_pts_to_arrays(
        raw_pts, unit["sx"], unit["sy"], unit["sz"], unit["ox"], unit["oy"], unit["oz"]
    )


def write_las(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    classification: np.ndarray | None = None,
    gps_time: np.ndarray | None = None,
    scale: tuple = (0.01, 0.01, 0.01),
) -> None:
    """Plain (uncompressed) LAS 1.2 writer, point format 0/1 — the S2
    sink the reference stubs out (``LAS/LasZipNetWriter.cs:7-9``
    throws NotImplementedException; we implement it). Offsets are the
    floored minima; atomic tmp+rename."""
    import os

    n = len(x)
    has_gps = gps_time is not None
    pfmt = 1 if has_gps else 0
    rec_len = 28 if has_gps else 20
    ox, oy, oz = (float(np.floor(v.min())) for v in (x, y, z))
    sx, sy, sz = scale
    X = np.round((x - ox) / sx).astype(np.int64)
    Y = np.round((y - oy) / sy).astype(np.int64)
    Z = np.round((z - oz) / sz).astype(np.int64)
    cls = (
        np.zeros(n, dtype=np.uint8)
        if classification is None
        else np.asarray(classification, dtype=np.uint8)
    )

    hdr = bytearray(227)
    hdr[0:4] = b"LASF"
    hdr[24] = 1
    hdr[25] = 2  # LAS 1.2
    hdr[26:58] = b"lasutility_ray".ljust(32, b"\0")
    hdr[58:90] = b"lasutility_ray writer".ljust(32, b"\0")
    struct.pack_into("<H", hdr, 94, 227)  # header size
    struct.pack_into("<I", hdr, 96, 227)  # point data offset
    struct.pack_into("<I", hdr, 100, 0)  # n VLRs
    hdr[104] = pfmt
    struct.pack_into("<H", hdr, 105, rec_len)
    struct.pack_into("<I", hdr, 107, n)
    struct.pack_into("<3d", hdr, 131, sx, sy, sz)
    struct.pack_into("<3d", hdr, 155, ox, oy, oz)
    struct.pack_into(
        "<6d", hdr, 179,
        float(x.max()), float(x.min()), float(y.max()),
        float(y.min()), float(z.max()), float(z.min()),
    )

    body = bytearray()
    for i in range(n):
        body += struct.pack(
            "<iiiHBBbBH", int(X[i]), int(Y[i]), int(Z[i]), 0, 0x09,
            int(cls[i]), 0, 0, 0,
        )
        if has_gps:
            body += struct.pack("<d", float(gps_time[i]))

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(bytes(hdr) + bytes(body))
    os.replace(tmp, path)


def write_las14(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    classification: np.ndarray | None = None,
    intensity: np.ndarray | None = None,
    gps_time: np.ndarray | None = None,
    rgb: tuple | None = None,
    nir: np.ndarray | None = None,
    scale: float = 0.01,
) -> None:
    """Plain LAS 1.4 writer, point format 6 (POINT14), 7 (+RGB) or
    8 (+RGB+NIR) — the modern point-record family the reference can
    only reach through its LASzip dependency. 375-byte LAS 1.4
    header, legacy count fields zeroed per spec, u64 count at 247;
    atomic tmp+rename."""
    import os

    n = len(x)
    has_rgb = rgb is not None
    has_nir = nir is not None
    if has_nir and not has_rgb:
        raise ValueError("format 8 (nir) requires rgb")
    pfmt = 8 if has_nir else (7 if has_rgb else 6)
    rec_len = 30 + (6 if has_rgb else 0) + (2 if has_nir else 0)

    ox, oy, oz = (float(np.floor(v.min())) if n else 0.0 for v in (x, y, z))
    X = np.round((x - ox) / scale).astype(np.int64)
    Y = np.round((y - oy) / scale).astype(np.int64)
    Z = np.round((z - oz) / scale).astype(np.int64)
    cls = (
        np.zeros(n, dtype=np.uint8)
        if classification is None
        else np.asarray(classification, dtype=np.uint8)
    )
    inten = (
        np.zeros(n, dtype=np.uint16)
        if intensity is None
        else np.asarray(intensity, dtype=np.uint16)
    )
    gps = (
        np.zeros(n, dtype=np.float64)
        if gps_time is None
        else np.asarray(gps_time, dtype=np.float64)
    )

    hdr = bytearray(375)
    hdr[0:4] = b"LASF"
    hdr[24] = 1
    hdr[25] = 4  # LAS 1.4
    hdr[26:58] = b"lasutility_ray".ljust(32, b"\0")
    hdr[58:90] = b"lasutility_ray writer".ljust(32, b"\0")
    struct.pack_into("<H", hdr, 94, 375)
    struct.pack_into("<I", hdr, 96, 375)  # point data offset
    struct.pack_into("<I", hdr, 100, 0)  # n VLRs
    hdr[104] = pfmt
    struct.pack_into("<H", hdr, 105, rec_len)
    struct.pack_into("<I", hdr, 107, 0)  # legacy count MUST be 0 for fmt 6+
    struct.pack_into("<3d", hdr, 131, scale, scale, scale)
    struct.pack_into("<3d", hdr, 155, ox, oy, oz)
    if n:
        struct.pack_into(
            "<6d", hdr, 179,
            float(x.max()), float(x.min()), float(y.max()),
            float(y.min()), float(z.max()), float(z.min()),
        )
    struct.pack_into("<Q", hdr, 247, n)  # u64 number of point records

    # vectorized record assembly via a structured array
    names = ["X", "Y", "Z", "intensity", "returns", "flags",
             "classification", "user", "scan_angle", "psid", "gps"]
    formats = ["<i4", "<i4", "<i4", "<u2", "u1", "u1", "u1", "u1", "<i2", "<u2", "<f8"]
    offsets = [0, 4, 8, 12, 14, 15, 16, 17, 18, 20, 22]
    if has_rgb:
        names += ["red", "green", "blue"]
        formats += ["<u2", "<u2", "<u2"]
        offsets += [30, 32, 34]
    if has_nir:
        names += ["nir"]
        formats += ["<u2"]
        offsets += [36]
    dt = np.dtype(
        {"names": names, "formats": formats, "offsets": offsets, "itemsize": rec_len}
    )
    arr = np.zeros(n, dtype=dt)
    arr["X"], arr["Y"], arr["Z"] = X.astype(np.int32), Y.astype(np.int32), Z.astype(np.int32)
    arr["intensity"] = inten
    arr["returns"] = 0x11  # return 1 of 1 (bits 0-3 / 4-7)
    arr["classification"] = cls
    arr["gps"] = gps
    if has_rgb:
        arr["red"], arr["green"], arr["blue"] = (
            np.asarray(rgb[0], np.uint16),
            np.asarray(rgb[1], np.uint16),
            np.asarray(rgb[2], np.uint16),
        )
    if has_nir:
        arr["nir"] = np.asarray(nir, np.uint16)

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(bytes(hdr))
        f.write(arr.tobytes())
    os.replace(tmp, path)


def read_laz_dataset(paths: list[str] | str):
    """S1 at the Ray layer: LAS/LAZ file(s) -> points Dataset
    (x, y, z, classification, intensity, gps_time, source). The
    parallelism unit is the laszip CHUNK when the file carries a
    compressed chunk table (one ranged read + one independent
    arithmetic stream per task — a single multi-GB LAZ tile decodes
    across the whole cluster), else the file (the reference's
    file-at-a-time model — ``LAS/LasZipNetReader.cs`` — distributed)."""
    import pyarrow as pa

    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]

    units = []
    for p in paths:
        units.extend(laz_read_units(p))

    def decode(batch: pa.Table) -> pa.Table:
        out = []
        for unit in batch.to_pylist():
            d = read_laz_chunk_points(unit)
            out.append(
                pa.table(
                    {
                        "x": pa.array(d["x"], pa.float64()),
                        "y": pa.array(d["y"], pa.float64()),
                        "z": pa.array(d["z"], pa.float64()),
                        "classification": pa.array(d["classification"], pa.uint8()),
                        "intensity": pa.array(d["intensity"], pa.uint16()),
                        "gps_time": pa.array(d["gps_time"], pa.float64()),
                        "red": pa.array(d["red"], pa.uint16()),
                        "green": pa.array(d["green"], pa.uint16()),
                        "blue": pa.array(d["blue"], pa.uint16()),
                        "source": pa.array([unit["path"]] * d["n_points"], pa.string()),
                    }
                )
            )
        return pa.concat_tables(out)

    files = rd.from_items(units)
    return files.map_batches(decode, batch_size=1, batch_format="pyarrow")
