"""Layered LAZ (compressor 3) codec for LAS 1.4 point formats 6/7/8
— POINT14 / RGB14 / RGBNIR14 v3 items, both directions.

Built from the public LASzip specification (laszip.org) on the same
FastAC coder / integer-compressor / streaming-median machinery that
``sources/laz.py`` pinned byte-exact against the reference's golden
compressor-2 fixture. The layered container follows the published
layout exactly: per chunk a raw first point, a u32 point count, one
u32 byte size per layer, then the layers — each layer an independent
arithmetic stream (channel_returns_XY, Z, classification, flags,
intensity, scan_angle, user_data, point_source, gps_time for POINT14;
one RGB layer; one NIR layer), with four scanner-channel contexts
that carry their own models and last-point state.

FIDELITY NOTE (honest capability boundary): no golden compressor-3
fixture exists in this sandbox (the reference ships only a format-1
LAZ) and there is no network, so conformance against files written by
the reference LASzip implementation is UNVALIDATED; model-layout
details the spec text leaves to the source (e.g. the 16x16
number-return context tables, the intensity context slotting) are
best-effort reconstructions, documented inline. What IS guaranteed
and pinned by tests: write->read round trips are bit-exact for every
field at every chunk boundary (tests/test_laz14.py), chunks decode
independently (the parallel-read unit), and the reader fails loudly
— a stream this codec cannot decode raises instead of returning
garbage (arithmetic desync surfaces as an exception, not silence).

Reference analogue: ``LasUtility/LAS/LasZipNetReader.cs:43-111``
reads these formats through its LASzip dependency; the reference's
writer is a stub (``LasZipNetWriter.cs:7-9``).
"""

from __future__ import annotations

import struct

import numpy as np

from .laz import (
    U32,
    _BitModel,  # noqa: F401  (re-export surface parity with laz.py)
    _Decoder,
    _GpsTime11v2,
    _IntegerDecompressor,
    _Model,
    _StreamingMedian5,
    _i32,
    _plain_arrays,
)
from .laz_writer import _Encoder, _GpsTime11v2Writer, _IntegerCompressor

# 16x16 context tables for the POINT14 return fields. The level table
# is |n - r| clamped to 7 (the published 8x8 table is exactly |n - r|,
# so the clamp is its only possible 16-return extension); the 6-value
# map folds the published 8x8 POINT10 map (values 0..15) to 6 context
# classes — a best-effort reconstruction of LASzip's
# number_return_map_6ctx (see FIDELITY NOTE above).
from .laz import _NUMBER_RETURN_MAP  # 8x8, values 0..15

_MAP6 = [
    [min(_NUMBER_RETURN_MAP[min(n, 7)][min(r, 7)], 5) for r in range(16)]
    for n in range(16)
]
_LEVEL8 = [[min(abs(n - r), 7) for r in range(16)] for n in range(16)]

N_LAYERS_P14 = 9  # channel_returns_XY, Z, class, flags, intens, scan, user, psid, gps


def _pack_p14(
    x, y, z, intensity, ret_byte, flag_byte, classification, user_data,
    scan_angle, point_source, gps_bits,
) -> bytes:
    return struct.pack(
        "<iiiHBBBBhHq",
        x, y, z, intensity, ret_byte, flag_byte, classification,
        user_data, _i16(scan_angle), point_source, gps_bits,
    )


def _i16(v: int) -> int:
    v &= 0xFFFF
    return v - 0x10000 if v >= 0x8000 else v


class _P14Last:
    """Per-context last-point state (mutable record)."""

    __slots__ = (
        "x", "y", "z", "intensity", "r", "n", "cls_flags", "scan_dir",
        "edge", "classification", "user_data", "scan_angle", "point_source",
        "gps_bits", "gps_change",
    )

    def __init__(self, raw30: bytes):
        (x, y, z, inten, rb, fb, cls, user, sa, psid, gps) = struct.unpack(
            "<iiiHBBBBhHq", raw30
        )
        self.x, self.y, self.z = x, y, z
        self.intensity = inten
        self.r = rb & 0xF
        self.n = (rb >> 4) & 0xF
        self.cls_flags = fb & 0xF
        self.scan_dir = (fb >> 6) & 1
        self.edge = (fb >> 7) & 1
        self.classification = cls
        self.user_data = user
        self.scan_angle = sa & 0xFFFF  # u16 bit pattern
        self.point_source = psid
        self.gps_bits = gps
        self.gps_change = False

    def copy_raw(self, scanner_channel: int) -> bytes:
        fb = (
            self.cls_flags
            | (scanner_channel << 4)
            | (self.scan_dir << 6)
            | (self.edge << 7)
        )
        return _pack_p14(
            self.x, self.y, self.z, self.intensity,
            self.r | (self.n << 4), fb, self.classification, self.user_data,
            self.scan_angle, self.point_source, self.gps_bits,
        )


class _P14Ctx:
    """One scanner-channel context: full model set + last item. The
    split across layer coders mirrors the spec's layer list."""

    def __init__(self, coders, raw30: bytes, is_writer: bool):
        (
            self.c_xy, self.c_z, self.c_cls, self.c_flags, self.c_int,
            self.c_scan, self.c_user, self.c_psid, self.c_gps,
        ) = coders
        IC = _IntegerCompressor if is_writer else _IntegerDecompressor
        self.last = _P14Last(raw30)
        self.m_changed_values = [_Model(128) for _ in range(8)]
        self.m_scanner_channel = _Model(3)
        self.m_number_of_returns = [None] * 16
        self.m_return_number = [None] * 16
        self.m_return_number_gps_same = _Model(13)
        self.ic_dx = IC(self.c_xy, 32, 2)
        self.ic_dy = IC(self.c_xy, 32, 22)
        self.ic_z = IC(self.c_z, 32, 20)
        self.last_x_diff_median5 = [_StreamingMedian5() for _ in range(12)]
        self.last_y_diff_median5 = [_StreamingMedian5() for _ in range(12)]
        self.last_z = [self.last.z] * 8
        self.m_classification = [None] * 64
        self.m_flags = [None] * 64
        self.m_user_data = [None] * 64
        self.ic_intensity = IC(self.c_int, 16, 4)
        self.last_intensity = [self.last.intensity] * 8
        self.ic_scan_angle = IC(self.c_scan, 16, 2)
        self.ic_point_source = IC(self.c_psid, 16)
        gps_raw = struct.pack("<q", self.last.gps_bits)
        if is_writer:
            self.gps = _GpsTime11v2Writer(self.c_gps, self.last.gps_bits)
        else:
            self.gps = _GpsTime11v2(self.c_gps, gps_raw)


def _lpr(last: _P14Last) -> int:
    lpr = 1 if last.r == 1 else 0
    lpr += 2 if last.r >= last.n else 0
    lpr += 4 if last.gps_change else 0
    return lpr


# ------------------------------------------------------------- reader


class _Point14v3:
    """POINT14 v3 layered decompressor (one chunk)."""

    def __init__(self, layer_blobs: list[bytes], raw30: bytes):
        # one decoder per non-empty layer; an empty layer means the
        # writer coded nothing in it (values never changed)
        self.decs = [
            _Decoder(b, 0) if len(b) else None for b in layer_blobs
        ]
        sc = (raw30[15] >> 4) & 3
        self.contexts: list[_P14Ctx | None] = [None] * 4
        self.contexts[sc] = _P14Ctx(self.decs, raw30, is_writer=False)
        self.current = sc

    def read(self) -> bytes:
        c = self.contexts[self.current]
        last = c.last
        cv = c.c_xy.decode_symbol(c.m_changed_values[_lpr(last)])

        if cv & 64:
            sym = c.c_xy.decode_symbol(c.m_scanner_channel)
            sc = (self.current + sym + 1) & 3
            if self.contexts[sc] is None:
                self.contexts[sc] = _P14Ctx(
                    self.decs, last.copy_raw(sc), is_writer=False
                )
            self.current = sc
            c = self.contexts[sc]
            last = c.last
        sc = self.current

        gps_change = bool(cv & 16)

        if cv & 4:
            if c.m_number_of_returns[last.n] is None:
                c.m_number_of_returns[last.n] = _Model(16)
            n = c.c_xy.decode_symbol(c.m_number_of_returns[last.n])
        else:
            n = last.n

        rcode = cv & 3
        if rcode == 0:
            r = last.r
        elif rcode == 1:
            r = (last.r + 1) & 15
        elif rcode == 2:
            r = (last.r + 15) & 15
        else:
            if gps_change:
                if c.m_return_number[last.r] is None:
                    c.m_return_number[last.r] = _Model(16)
                r = c.c_xy.decode_symbol(c.m_return_number[last.r])
            else:
                sym = c.c_xy.decode_symbol(c.m_return_number_gps_same)
                r = (last.r + sym + 2) & 15

        m = _MAP6[n][r]
        l = _LEVEL8[n][r]
        cpr = (2 if r == 1 else 0) + (1 if r >= n else 0)
        idx = (m << 1) | (1 if gps_change else 0)

        median = c.last_x_diff_median5[idx].get()
        diff = c.ic_dx.decompress(median, 1 if n == 1 else 0)
        x = _i32(last.x + diff)
        c.last_x_diff_median5[idx].add(diff)

        k_bits = c.ic_dx.k
        median = c.last_y_diff_median5[idx].get()
        ctx = (1 if n == 1 else 0) + ((k_bits & ~1) if k_bits < 20 else 20)
        diff = c.ic_dy.decompress(median, ctx)
        y = _i32(last.y + diff)
        c.last_y_diff_median5[idx].add(diff)

        k_bits = (c.ic_dx.k + c.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + ((k_bits & ~1) if k_bits < 18 else 18)
        z = c.ic_z.decompress(c.last_z[l], ctx)
        c.last_z[l] = z

        ccc = ((last.classification & 0x1F) << 1) | (1 if cpr == 3 else 0)
        if c.m_classification[ccc] is None:
            c.m_classification[ccc] = _Model(256)
        classification = c.c_cls.decode_symbol(c.m_classification[ccc])

        lf = last.cls_flags | (last.scan_dir << 4) | (last.edge << 5)
        if c.m_flags[lf] is None:
            c.m_flags[lf] = _Model(64)
        fl = c.c_flags.decode_symbol(c.m_flags[lf])
        cls_flags = fl & 0xF
        scan_dir = (fl >> 4) & 1
        edge = (fl >> 5) & 1

        iidx = (cpr << 1) | (1 if gps_change else 0)
        intensity = c.ic_intensity.decompress(c.last_intensity[iidx], cpr)
        c.last_intensity[iidx] = intensity

        if cv & 8:
            scan_angle = c.ic_scan_angle.decompress(
                last.scan_angle, 1 if gps_change else 0
            )
        else:
            scan_angle = last.scan_angle

        ui = last.user_data // 4
        if c.m_user_data[ui] is None:
            c.m_user_data[ui] = _Model(256)
        user_data = c.c_user.decode_symbol(c.m_user_data[ui])

        if cv & 32:
            point_source = c.ic_point_source.decompress(last.point_source)
        else:
            point_source = last.point_source

        if gps_change:
            c.gps.read()
            gps_bits = c.gps.last_gpstime[c.gps.last]
        else:
            gps_bits = last.gps_bits

        last.x, last.y, last.z = x, y, z
        last.intensity = intensity
        last.r, last.n = r, n
        last.cls_flags, last.scan_dir, last.edge = cls_flags, scan_dir, edge
        last.classification = classification
        last.user_data = user_data
        last.scan_angle = scan_angle
        last.point_source = point_source
        last.gps_bits = gps_bits
        last.gps_change = gps_change

        fb = cls_flags | (sc << 4) | (scan_dir << 6) | (edge << 7)
        return _pack_p14(
            x, y, z, intensity, r | (n << 4), fb, classification,
            user_data, scan_angle, point_source, gps_bits,
        )


class _Rgb14v3:
    """RGB14 v3: the RGB12 scheme with one model set per scanner
    channel (context passed in from the point item)."""

    def __init__(self, dec: _Decoder | None, raw6: bytes):
        self.dec = dec
        first = struct.unpack("<HHH", raw6)
        self.last = [None] * 4
        self.models = [None] * 4
        self.first = first

    def _ctx(self, context: int, seed):
        if self.models[context] is None:
            self.models[context] = (
                _Model(128),
                [_Model(256) for _ in range(6)],
            )
            self.last[context] = list(seed)
        return self.models[context], self.last[context]

    def read(self, context: int, seed) -> tuple:
        from .laz import _div2_trunc, _u8_clamp, _u8_fold

        (m_used, m_diff), last = self._ctx(context, seed)
        if self.dec is None:
            return tuple(last)
        dec = self.dec
        lr, lg, lb = last
        sym = dec.decode_symbol(m_used)
        if sym & 1:
            corr = dec.decode_symbol(m_diff[0])
            r_lo = _u8_fold(corr + (lr & 0xFF))
        else:
            r_lo = lr & 0xFF
        if sym & 2:
            corr = dec.decode_symbol(m_diff[1])
            r_hi = _u8_fold(corr + (lr >> 8))
        else:
            r_hi = lr >> 8
        r = r_lo | (r_hi << 8)
        if sym & 64:
            diff = r_lo - (lr & 0xFF)
            if sym & 4:
                corr = dec.decode_symbol(m_diff[2])
                g_lo = _u8_fold(corr + _u8_clamp(diff + (lg & 0xFF)))
            else:
                g_lo = lg & 0xFF
            if sym & 16:
                corr = dec.decode_symbol(m_diff[4])
                diff_b = _div2_trunc(diff + (g_lo - (lg & 0xFF)))
                b_lo = _u8_fold(corr + _u8_clamp(diff_b + (lb & 0xFF)))
            else:
                b_lo = lb & 0xFF
            diff = r_hi - (lr >> 8)
            if sym & 8:
                corr = dec.decode_symbol(m_diff[3])
                g_hi = _u8_fold(corr + _u8_clamp(diff + (lg >> 8)))
            else:
                g_hi = lg >> 8
            if sym & 32:
                corr = dec.decode_symbol(m_diff[5])
                diff_b = _div2_trunc(diff + (g_hi - (lg >> 8)))
                b_hi = _u8_fold(corr + _u8_clamp(diff_b + (lb >> 8)))
            else:
                b_hi = lb >> 8
            g = g_lo | (g_hi << 8)
            b = b_lo | (b_hi << 8)
        else:
            g = b = r
        last[0], last[1], last[2] = r, g, b
        return r, g, b


class _Nir14v3:
    """NIR layer of RGBNIR14 v3: byte-wise diff coding per context."""

    def __init__(self, dec: _Decoder | None, first: int):
        self.dec = dec
        self.first = first
        self.last = [None] * 4
        self.models = [None] * 4

    def _ctx(self, context: int, seed: int):
        if self.models[context] is None:
            self.models[context] = (_Model(4), _Model(256), _Model(256))
            self.last[context] = seed
        return self.models[context], self.last[context]

    def read(self, context: int, seed: int) -> int:
        from .laz import _u8_fold

        (m_used, m_lo, m_hi), last = self._ctx(context, seed)
        if self.dec is None:
            return last
        dec = self.dec
        sym = dec.decode_symbol(m_used)
        if sym & 1:
            lo = _u8_fold(dec.decode_symbol(m_lo) + (last & 0xFF))
        else:
            lo = last & 0xFF
        if sym & 2:
            hi = _u8_fold(dec.decode_symbol(m_hi) + (last >> 8))
        else:
            hi = last >> 8
        nir = lo | (hi << 8)
        self.last[context] = nir
        return nir


# ------------------------------------------------------------- writer


class _Point14v3Writer:
    """POINT14 v3 layered compressor — mirror of _Point14v3."""

    def __init__(self, raw30: bytes):
        self.encs = [_Encoder() for _ in range(N_LAYERS_P14)]
        sc = (raw30[15] >> 4) & 3
        self.contexts: list[_P14Ctx | None] = [None] * 4
        self.contexts[sc] = _P14Ctx(self.encs, raw30, is_writer=True)
        self.current = sc

    def write(self, raw30: bytes):
        pt = _P14Last(raw30)
        sc = (raw30[15] >> 4) & 3
        c = self.contexts[self.current]
        old_last = c.last
        lpr = _lpr(old_last)

        # the reference item for the change bits is the TARGET
        # context's last point (the reader compares against it after
        # the switch; an unused target context is seeded from the
        # current context's last point, so the comparison base matches)
        if sc != self.current:
            target = self.contexts[sc]
            ref = target.last if target is not None else old_last
        else:
            ref = old_last

        gps_change = pt.gps_bits != ref.gps_bits
        rdiff = (pt.r - ref.r) & 15
        rcode = {0: 0, 1: 1, 15: 2}.get(rdiff, 3)
        cv = (
            ((64 if sc != self.current else 0))
            | (32 if pt.point_source != ref.point_source else 0)
            | (16 if gps_change else 0)
            | (8 if pt.scan_angle != ref.scan_angle else 0)
            | (4 if pt.n != ref.n else 0)
            | rcode
        )
        c.c_xy.encode_symbol(c.m_changed_values[lpr], cv)

        if cv & 64:
            c.c_xy.encode_symbol(
                c.m_scanner_channel, ((sc - self.current) & 3) - 1
            )
            if self.contexts[sc] is None:
                self.contexts[sc] = _P14Ctx(
                    self.encs, old_last.copy_raw(sc), is_writer=True
                )
            self.current = sc
            c = self.contexts[sc]
        last = c.last

        if cv & 4:
            if c.m_number_of_returns[last.n] is None:
                c.m_number_of_returns[last.n] = _Model(16)
            c.c_xy.encode_symbol(c.m_number_of_returns[last.n], pt.n)
        if rcode == 3:
            if gps_change:
                if c.m_return_number[last.r] is None:
                    c.m_return_number[last.r] = _Model(16)
                c.c_xy.encode_symbol(c.m_return_number[last.r], pt.r)
            else:
                c.c_xy.encode_symbol(
                    c.m_return_number_gps_same, rdiff - 2
                )

        n, r = pt.n, pt.r
        m = _MAP6[n][r]
        l = _LEVEL8[n][r]
        cpr = (2 if r == 1 else 0) + (1 if r >= n else 0)
        idx = (m << 1) | (1 if gps_change else 0)

        median = c.last_x_diff_median5[idx].get()
        diff = _i32(pt.x - last.x)
        c.ic_dx.compress(median, diff, 1 if n == 1 else 0)
        c.last_x_diff_median5[idx].add(diff)

        k_bits = c.ic_dx.k
        median = c.last_y_diff_median5[idx].get()
        ctx = (1 if n == 1 else 0) + ((k_bits & ~1) if k_bits < 20 else 20)
        diff = _i32(pt.y - last.y)
        c.ic_dy.compress(median, diff, ctx)
        c.last_y_diff_median5[idx].add(diff)

        k_bits = (c.ic_dx.k + c.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + ((k_bits & ~1) if k_bits < 18 else 18)
        c.ic_z.compress(c.last_z[l], pt.z, ctx)
        c.last_z[l] = pt.z

        ccc = ((last.classification & 0x1F) << 1) | (1 if cpr == 3 else 0)
        if c.m_classification[ccc] is None:
            c.m_classification[ccc] = _Model(256)
        c.c_cls.encode_symbol(c.m_classification[ccc], pt.classification)

        lf = last.cls_flags | (last.scan_dir << 4) | (last.edge << 5)
        if c.m_flags[lf] is None:
            c.m_flags[lf] = _Model(64)
        fl = pt.cls_flags | (pt.scan_dir << 4) | (pt.edge << 5)
        c.c_flags.encode_symbol(c.m_flags[lf], fl)

        iidx = (cpr << 1) | (1 if gps_change else 0)
        c.ic_intensity.compress(c.last_intensity[iidx], pt.intensity, cpr)
        c.last_intensity[iidx] = pt.intensity

        if cv & 8:
            c.ic_scan_angle.compress(
                last.scan_angle, pt.scan_angle, 1 if gps_change else 0
            )

        ui = last.user_data // 4
        if c.m_user_data[ui] is None:
            c.m_user_data[ui] = _Model(256)
        c.c_user.encode_symbol(c.m_user_data[ui], pt.user_data)

        if cv & 32:
            c.ic_point_source.compress(last.point_source, pt.point_source)

        if gps_change:
            c.gps.write(pt.gps_bits)

        pt.gps_change = gps_change
        c.last = pt

    def layer_blobs(self) -> list[bytes]:
        return [e.done() for e in self.encs]


class _Rgb14v3Writer:
    def __init__(self, first: tuple):
        self.enc = _Encoder()
        self.first = first
        self.last = [None] * 4
        self.models = [None] * 4

    def _ctx(self, context: int, seed):
        if self.models[context] is None:
            self.models[context] = (
                _Model(128),
                [_Model(256) for _ in range(6)],
            )
            self.last[context] = list(seed)
        return self.models[context], self.last[context]

    def write(self, context: int, seed, r: int, g: int, b: int):
        from .laz import _div2_trunc, _u8_clamp, _u8_fold

        (m_used, m_diff), last = self._ctx(context, seed)
        enc = self.enc
        lr, lg, lb = last
        sym = 0
        if (r & 0xFF) != (lr & 0xFF):
            sym |= 1
        if (r >> 8) != (lr >> 8):
            sym |= 2
        if (
            ((r & 0x00FF) != (g & 0x00FF))
            or ((r & 0x00FF) != (b & 0x00FF))
            or ((r & 0xFF00) != (g & 0xFF00))
            or ((r & 0xFF00) != (b & 0xFF00))
        ):
            sym |= 1 << 6
            if (g & 0xFF) != (lg & 0xFF):
                sym |= 1 << 2
            if (b & 0xFF) != (lb & 0xFF):
                sym |= 1 << 4
            if (g >> 8) != (lg >> 8):
                sym |= 1 << 3
            if (b >> 8) != (lb >> 8):
                sym |= 1 << 5
        enc.encode_symbol(m_used, sym)
        if sym & 1:
            enc.encode_symbol(m_diff[0], _u8_fold((r & 0xFF) - (lr & 0xFF)))
        if sym & 2:
            enc.encode_symbol(m_diff[1], _u8_fold((r >> 8) - (lr >> 8)))
        if sym & 64:
            diff = (r & 0xFF) - (lr & 0xFF)
            if sym & 4:
                enc.encode_symbol(
                    m_diff[2], _u8_fold((g & 0xFF) - _u8_clamp(diff + (lg & 0xFF)))
                )
            if sym & 16:
                diff_b = _div2_trunc(diff + ((g & 0xFF) - (lg & 0xFF)))
                enc.encode_symbol(
                    m_diff[4], _u8_fold((b & 0xFF) - _u8_clamp(diff_b + (lb & 0xFF)))
                )
            diff = (r >> 8) - (lr >> 8)
            if sym & 8:
                enc.encode_symbol(
                    m_diff[3], _u8_fold((g >> 8) - _u8_clamp(diff + (lg >> 8)))
                )
            if sym & 32:
                diff_b = _div2_trunc(diff + ((g >> 8) - (lg >> 8)))
                enc.encode_symbol(
                    m_diff[5], _u8_fold((b >> 8) - _u8_clamp(diff_b + (lb >> 8)))
                )
        last[0], last[1], last[2] = r, g, b


class _Nir14v3Writer:
    def __init__(self, first: int):
        self.enc = _Encoder()
        self.first = first
        self.last = [None] * 4
        self.models = [None] * 4

    def _ctx(self, context: int, seed: int):
        if self.models[context] is None:
            self.models[context] = (_Model(4), _Model(256), _Model(256))
            self.last[context] = seed
        return self.models[context], self.last[context]

    def write(self, context: int, seed: int, nir: int):
        from .laz import _u8_fold

        (m_used, m_lo, m_hi), last = self._ctx(context, seed)
        enc = self.enc
        sym = (1 if (nir & 0xFF) != (last & 0xFF) else 0) | (
            2 if (nir >> 8) != (last >> 8) else 0
        )
        enc.encode_symbol(m_used, sym)
        if sym & 1:
            enc.encode_symbol(m_lo, _u8_fold((nir & 0xFF) - (last & 0xFF)))
        if sym & 2:
            enc.encode_symbol(m_hi, _u8_fold((nir >> 8) - (last >> 8)))
        self.last[context] = nir


# ---------------------------------------------------- chunk codec


def rec_len14(pfmt: int) -> int:
    return {6: 30, 7: 36, 8: 38}[pfmt]


def encode_chunk14(records: list[bytes], pfmt: int) -> bytes:
    """Compress one chunk of raw POINT14(+RGB/NIR) records into the
    layered layout: raw first record, u32 count, u32 per-layer sizes,
    then the layer bytes."""
    first = records[0]
    pw = _Point14v3Writer(first[:30])
    cw = nw = None
    if pfmt >= 7:
        cw = _Rgb14v3Writer(struct.unpack("<HHH", first[30:36]))
    if pfmt == 8:
        nw = _Nir14v3Writer(struct.unpack("<H", first[36:38])[0])
    for rec in records[1:]:
        pw.write(rec[:30])
        ctx = pw.current
        if cw is not None:
            cw.write(
                ctx, cw.first, *struct.unpack("<HHH", rec[30:36])
            )
        if nw is not None:
            nw.write(ctx, nw.first, struct.unpack("<H", rec[36:38])[0])
    layers = pw.layer_blobs()
    if cw is not None:
        layers.append(cw.enc.done())
    if nw is not None:
        layers.append(nw.enc.done())
    out = bytearray()
    out += first
    out += struct.pack("<I", len(records))
    for b in layers:
        out += struct.pack("<I", len(b))
    for b in layers:
        out += b
    return bytes(out)


def decode_chunk14(data: bytes, off: int, n_chunk: int, pfmt: int):
    """Decode one layered chunk starting at ``off``; returns
    (raw_records, end_offset). Raw records use the standard POINT14
    (+RGB/+NIR) wire layout, so downstream array extraction is the
    same vectorized structured-dtype unpack as plain LAS 1.4."""
    rl = rec_len14(pfmt)
    first = data[off : off + rl]
    if len(first) < rl:
        raise ValueError("laz14: truncated chunk (raw first point)")
    off += rl
    (count,) = struct.unpack_from("<I", data, off)
    off += 4
    if count != n_chunk:
        raise ValueError(
            f"laz14: chunk count mismatch (stream {count}, table {n_chunk})"
        )
    n_layers = N_LAYERS_P14 + (1 if pfmt >= 7 else 0) + (1 if pfmt == 8 else 0)
    sizes = struct.unpack_from(f"<{n_layers}I", data, off)
    off += 4 * n_layers
    blobs = []
    for sz in sizes:
        blobs.append(data[off : off + sz])
        if len(blobs[-1]) != sz:
            raise ValueError("laz14: truncated layer")
        off += sz
    pr = _Point14v3(blobs[:N_LAYERS_P14], first[:30])
    cr = nr = None
    li = N_LAYERS_P14
    if pfmt >= 7:
        cr = _Rgb14v3(
            _Decoder(blobs[li], 0) if sizes[li] else None, first[30:36]
        )
        li += 1
    if pfmt == 8:
        nr = _Nir14v3(
            _Decoder(blobs[li], 0) if sizes[li] else None,
            struct.unpack("<H", first[36:38])[0],
        )
    records = [first]
    for _ in range(n_chunk - 1):
        rec = pr.read()
        ctx = pr.current
        if cr is not None:
            rec += struct.pack("<HHH", *cr.read(ctx, cr.first))
        if nr is not None:
            rec += struct.pack("<H", nr.read(ctx, nr.first))
        records.append(rec)
    return records, off


# ---------------------------------------------------- file level

_ITEMS14 = {6: [(10, 30, 3)], 7: [(10, 30, 3), (11, 6, 3)], 8: [(10, 30, 3), (12, 8, 3)]}
DEFAULT_CHUNK_SIZE = 50000


def parse_laszip_vlr14(laszip_vlr: bytes):
    """Validate a compressor-3 (layered) VLR against what this codec
    implements; returns ``(pfmt, chunk_size)``."""
    compressor, coder = struct.unpack_from("<HH", laszip_vlr, 0)
    (chunk_size,) = struct.unpack_from("<i", laszip_vlr, 12)
    (n_items,) = struct.unpack_from("<H", laszip_vlr, 32)
    items = [
        struct.unpack_from("<HHH", laszip_vlr, 34 + 6 * j) for j in range(n_items)
    ]
    if compressor != 3 or coder != 0:
        raise NotImplementedError(f"laszip compressor {compressor}/coder {coder}")
    for pfmt, want in _ITEMS14.items():
        if [tuple(i) for i in items] == want:
            if chunk_size <= 0:
                raise NotImplementedError(
                    f"invalid laszip chunk size {chunk_size}"
                )
            return pfmt, chunk_size
    raise NotImplementedError(f"laszip layered items {items}")


def read_laz14_points(data: bytes, pdr_off: int, npoints: int, laszip_vlr: bytes,
                      sx, sy, sz, ox, oy, oz):
    """Sequential whole-file decode of a layered LAZ -> column arrays
    (same contract as laz.read_laz_points)."""
    from .laz import _read_chunk_table

    pfmt, chunk_size = parse_laszip_vlr14(laszip_vlr)
    _read_chunk_table(data, pdr_off, variable=False)  # validates if present
    records: list[bytes] = []
    off = pdr_off + 8
    done = 0
    while done < npoints:
        n_chunk = min(chunk_size, npoints - done)
        recs, off = decode_chunk14(data, off, n_chunk, pfmt)
        records.extend(recs)
        done += n_chunk
    blob = b"".join(records)
    return _plain_arrays(
        blob, 0, npoints, pfmt, rec_len14(pfmt), sx, sy, sz, ox, oy, oz
    )


def write_laz14(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    classification: np.ndarray | None = None,
    intensity: np.ndarray | None = None,
    gps_time: np.ndarray | None = None,
    rgb: tuple | None = None,
    nir: np.ndarray | None = None,
    return_number: np.ndarray | None = None,
    number_of_returns: np.ndarray | None = None,
    scanner_channel: np.ndarray | None = None,
    scan_angle: np.ndarray | None = None,
    user_data: np.ndarray | None = None,
    point_source: np.ndarray | None = None,
    classification_flags: np.ndarray | None = None,
    scale: float = 0.01,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> None:
    """Write a compressed LAS 1.4 file (LAZ compressor 3, layered):
    point format 6 (+rgb -> 7, +rgb+nir -> 8). All extended POINT14
    fields are accepted; omitted ones default to zero. Coordinates
    quantize at ``scale`` with offset floor(min) — lossless for
    values on the scale grid."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive (got {chunk_size})")
    if nir is not None and rgb is None:
        raise ValueError("nir requires rgb (point format 8)")
    n = len(x)
    pfmt = 6 + (1 if rgb is not None else 0) + (1 if nir is not None else 0)
    rl = rec_len14(pfmt)

    def arr(a, dtype, default=0):
        if a is None:
            return np.full(n, default, dtype=dtype)
        return np.asarray(a).astype(dtype)

    classification = arr(classification, np.uint8)
    intensity = arr(intensity, np.uint16)
    ret_num = arr(return_number, np.uint8, 1) & 0xF
    num_ret = arr(number_of_returns, np.uint8, 1) & 0xF
    chan = arr(scanner_channel, np.uint8) & 0x3
    sa = arr(scan_angle, np.int16)
    ud = arr(user_data, np.uint8)
    psid = arr(point_source, np.uint16)
    cflags = arr(classification_flags, np.uint8) & 0xF

    ox = float(np.floor(x.min())) if n else 0.0
    oy = float(np.floor(y.min())) if n else 0.0
    oz = float(np.floor(z.min())) if n else 0.0
    xi = np.round((x - ox) / scale).astype(np.int64).astype(np.int32)
    yi = np.round((y - oy) / scale).astype(np.int64).astype(np.int32)
    zi = np.round((z - oz) / scale).astype(np.int64).astype(np.int32)
    gbits = (
        np.frombuffer(np.asarray(gps_time, dtype="<f8").tobytes(), dtype="<i8")
        if gps_time is not None
        else np.zeros(n, dtype=np.int64)
    )

    rb = (ret_num | (num_ret << 4)).astype(np.uint8)
    fb = (cflags | (chan << 4)).astype(np.uint8)  # scan_dir/edge default 0

    def record(i: int) -> bytes:
        rec = _pack_p14(
            int(xi[i]), int(yi[i]), int(zi[i]), int(intensity[i]),
            int(rb[i]), int(fb[i]), int(classification[i]), int(ud[i]),
            int(sa[i]), int(psid[i]), int(gbits[i]),
        )
        if rgb is not None:
            rec += struct.pack(
                "<HHH", int(rgb[0][i]), int(rgb[1][i]), int(rgb[2][i])
            )
        if nir is not None:
            rec += struct.pack("<H", int(nir[i]))
        return rec

    chunks: list[bytes] = []
    done = 0
    while done < n:
        n_chunk = min(chunk_size, n - done)
        recs = [record(i) for i in range(done, done + n_chunk)]
        chunks.append(encode_chunk14(recs, pfmt))
        done += n_chunk

    items = _ITEMS14[pfmt]
    vlr_payload = struct.pack("<HH", 3, 0)
    vlr_payload += struct.pack("<BBH", 3, 4, 3)  # laszip version
    vlr_payload += struct.pack("<I", 0)
    vlr_payload += struct.pack("<I", chunk_size)
    vlr_payload += struct.pack("<qq", 0, 0)
    vlr_payload += struct.pack("<H", len(items))
    for t, szi, v in items:
        vlr_payload += struct.pack("<HHH", t, szi, v)
    vlr = (
        struct.pack("<H", 0)
        + b"laszip encoded\x00\x00"
        + struct.pack("<HH", 22204, len(vlr_payload))
        + b"\x00" * 32
        + vlr_payload
    )

    header_size = 375  # LAS 1.4
    pdr_off = header_size + len(vlr)
    hdr = bytearray(header_size)
    hdr[0:4] = b"LASF"
    struct.pack_into("<BB", hdr, 24, 1, 4)
    struct.pack_into("<H", hdr, 94, header_size)
    struct.pack_into("<I", hdr, 96, pdr_off)
    struct.pack_into("<I", hdr, 100, 1)
    hdr[104] = pfmt | 0x80
    struct.pack_into("<H", hdr, 105, rl)
    struct.pack_into("<I", hdr, 107, 0)  # legacy count: 0 for formats 6+
    struct.pack_into("<3d", hdr, 131, scale, scale, scale)
    struct.pack_into("<3d", hdr, 155, ox, oy, oz)
    if n:
        struct.pack_into(
            "<6d", hdr, 179,
            float(x.max()), float(x.min()),
            float(y.max()), float(y.min()),
            float(z.max()), float(z.min()),
        )
    struct.pack_into("<Q", hdr, 247, n)  # u64 point count

    from .laz_writer import _IntegerCompressor as _TIC

    chunk_bytes = [len(cb) for cb in chunks]
    table_off = pdr_off + 8 + sum(chunk_bytes)
    tenc = _Encoder()
    tic = _TIC(tenc, 32, 2)
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
        for cb in chunks:
            f.write(cb)
        f.write(table)
