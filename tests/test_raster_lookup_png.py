"""J4/M9 distributed raster->vector lookup vs the single-process
ByteRaster.GetValue oracle, plus the PNG codec round trip (S8)."""

import numpy as np
import pytest

import ray.data as rd

from lasutility_ray.corpus.polygons import build_feature_table
from lasutility_ray.geom.ascii_grid import ByteRaster
from lasutility_ray.geom.bounds import RasterBounds
from lasutility_ray.geom.png import decode_grey_png, encode_grey_png
from lasutility_ray.geom.tilenamer import decode
from lasutility_ray.stages.pip_join import burned_tiles, explode_features_to_tiles
from lasutility_ray.stages.raster_lookup import raster_value_lookup
from lasutility_ray.stages.tiling import points_dataset

SF_DIR = "/root/testdata/sf0.01"


def test_png_roundtrip():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, (40, 60), dtype=np.uint8)
    png = encode_grey_png(data)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    back = decode_grey_png(png)
    assert (back == data).all()


def test_lookup_matches_get_value(ray_session):
    feats = explode_features_to_tiles(build_feature_table())
    tiles = burned_tiles(rd.from_arrow(feats)).materialize()

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    pts = points_dataset(docs)

    got = (
        raster_value_lookup(pts, tiles)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pts_df = pts.to_pandas()
    assert len(got) == len(pts_df)

    # single-process oracle: ByteRaster.get_value per tile
    rasters = {}
    for row in tiles.take_all():
        bounds = RasterBounds.for_tile(decode(row["tile_id"]), 1.0)
        data = np.frombuffer(row["raster"], dtype=np.uint8).reshape(
            bounds.n_rows, bounds.n_cols
        )
        rasters[row["tile_id"]] = ByteRaster(bounds, data.copy())

    got_idx = got.set_index("doc_id")["raster_value"]
    n_hits = 0
    for _, p in pts_df.iterrows():
        r = rasters.get(p["tile_id"])
        want = r.get_value(p["x"], p["y"]) if r is not None else float("nan")
        have = got_idx.loc[p["doc_id"]]
        if np.isnan(want):
            assert np.isnan(have), p["doc_id"]
        else:
            assert have == want, p["doc_id"]
            n_hits += 1
    assert n_hits > 0  # fixture must produce real hits


def test_png_sink(ray_session, tmp_path):
    from lasutility_ray.sources import write_burned_tiles_png

    feats = explode_features_to_tiles(build_feature_table())
    tiles = burned_tiles(rd.from_arrow(feats)).materialize()
    man = write_burned_tiles_png(tiles, str(tmp_path / "png"))
    rows = man.take_all()
    assert len(rows) == tiles.count()
    with open(rows[0]["path"], "rb") as f:
        png = f.read()
    img = decode_grey_png(png)
    assert img.shape == (1000, 1000)
    orig = {r["tile_id"]: r["raster"] for r in tiles.take_all()}
    want = np.frombuffer(orig[rows[0]["tile_id"]], dtype=np.uint8).reshape(1000, 1000)
    assert (img == want).all()


def _filter_scanlines(img, ftypes):
    """Reference PNG filterer: apply each row's filter FORWARD (per
    the spec) so decode_png must invert it exactly."""
    import numpy as np

    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int32)
    out = b""
    prev = np.zeros(w * c, dtype=np.int32)
    for i, f in enumerate(ftypes):
        cur = flat[i]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.zeros_like(cur); left[c:] = cur[:-c]
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            left = np.zeros_like(cur); left[c:] = cur[:-c]
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            enc = cur.copy()
            for j in range(len(cur)):
                a = int(cur[j - c]) if j >= c else 0
                b = int(prev[j])
                cd = int(prev[j - c]) if j >= c else 0
                p = a + b - cd
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cd)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cd)
                enc[j] = (cur[j] - pred) & 0xFF
        out += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = cur
    return out


def _make_png(img, ftypes):
    import struct, zlib

    from lasutility_ray.geom.png import _chunk, _SIG

    h, w, c = img.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = _filter_scanlines(img, ftypes)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_decode_png_all_filters_all_colors():
    import numpy as np

    from lasutility_ray.geom.png import decode_png

    rng = np.random.default_rng(7)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, (5, 6, c), dtype=np.uint8)
        ftypes = [0, 1, 2, 3, 4]
        got = decode_png(_make_png(img, ftypes))
        assert got.shape == (5, 6, c)
        assert (got == img).all(), f"channels={c}"


def test_decode_png_rejects_bad_crc_and_formats():
    import numpy as np
    import pytest

    from lasutility_ray.geom.png import decode_png, encode_grey_png

    png = encode_grey_png(np.zeros((3, 3), dtype=np.uint8))
    corrupted = png[:40] + bytes([png[40] ^ 0xFF]) + png[41:]
    with pytest.raises(ValueError, match="CRC"):
        decode_png(corrupted)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")


def test_decode_image_handles_real_png():
    import numpy as np

    from lasutility_ray.geom.png import encode_grey_png
    from lasutility_ray.stages.multimodal import decode_image

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = encode_grey_png(img, top_down=False)
    got = decode_image(png)
    assert got.shape == (8, 8)
    assert (got == img).all()


def test_adam7_interlaced_png_decodes():
    import struct
    import zlib

    import numpy as np

    from lasutility_ray.geom.png import _SIG, _chunk, decode_png

    rng = np.random.default_rng(3)
    for h, w, c, color in ((13, 9, 1, 0), (16, 16, 3, 2), (5, 3, 4, 6)):
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        # build the Adam7 stream: each pass = filter-0 rows of the
        # pass's sub-image
        raw = bytearray()
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for r in range(sub.shape[0]):
                raw += b"\x00" + sub[r].tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
        data = (
            _SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        out = decode_png(data)
        assert np.array_equal(out, img), (h, w, c)


def test_palette_png_decodes_to_rgb():
    import struct
    import zlib

    import numpy as np
    import pytest

    from lasutility_ray.geom.png import _SIG, _chunk, decode_png

    rng = np.random.default_rng(4)
    h, w = 11, 6
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    data = (
        _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert np.array_equal(out, pal[idx])
    # missing PLTE is a data error; oob index is a data error
    bad = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)
    small = (
        _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal[:8].tobytes())
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(small)


def test_sub8bit_grey_and_palette_png():
    import struct
    import zlib

    import numpy as np

    from lasutility_ray.geom.png import _SIG, _chunk, decode_png

    rng = np.random.default_rng(5)
    for depth in (1, 2, 4):
        h, w = 9, 13  # width not a multiple of 8/depth -> padded rows
        maxv = (1 << depth) - 1
        img = rng.integers(0, maxv + 1, (h, w), dtype=np.uint8)
        # pack rows MSB-first with zero padding to the byte boundary
        rows = bytearray()
        for r in range(h):
            bits = np.zeros(((w * depth + 7) // 8) * 8, np.uint8)
            for x in range(w):
                for b in range(depth):
                    bits[x * depth + b] = (img[r, x] >> (depth - 1 - b)) & 1
            rows += b"\x00" + np.packbits(bits).tobytes()
        # grey: samples rescale to 8-bit
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
        data = (
            _SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(rows))) + _chunk(b"IEND", b"")
        )
        out = decode_png(data)
        expect = (img.astype(np.uint16) * 255 // maxv).astype(np.uint8)
        assert np.array_equal(out[:, :, 0], expect), f"grey depth={depth}"
        # palette: samples are raw indices into PLTE
        pal = rng.integers(0, 256, (maxv + 1, 3), dtype=np.uint8)
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
        data = (
            _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
            + _chunk(b"IDAT", zlib.compress(bytes(rows))) + _chunk(b"IEND", b"")
        )
        out = decode_png(data)
        assert np.array_equal(out, pal[img]), f"palette depth={depth}"


def test_grey16_png_roundtrip():
    import numpy as np

    from lasutility_ray.geom.png import decode_png, encode_grey16_png

    rng = np.random.default_rng(6)
    data = rng.integers(0, 65536, (23, 17), dtype=np.uint16)
    png = encode_grey16_png(data, top_down=False)
    out = decode_png(png)
    assert out.dtype == np.uint16
    assert np.array_equal(out[:, :, 0], data)


def test_dem_png16_sink_roundtrip(ray_session, tmp_path):
    import numpy as np

    from lasutility_ray.sources.ascii_tiles import read_dem_png16, write_dem_tiles_png16
    from lasutility_ray.stages.tiling import points_dataset
    from lasutility_ray.stages.tin import tin_tiles

    pts = points_dataset(
        rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    )
    tiles = tin_tiles(pts, include_rasters=True).materialize()
    man = write_dem_tiles_png16(tiles, str(tmp_path / "png16"), cell_size=10.0)
    rows = man.to_pandas()
    assert len(rows) == tiles.count()
    dems = {r["tile_id"]: r["dem"] for r in tiles.take_all()}
    checked = 0
    for _, r in rows.iterrows():
        back = read_dem_png16(r["path"], r["z_offset"], r["z_scale"])
        want = np.frombuffer(dems[r["tile_id"]], dtype=np.float32).reshape(back.shape)
        m = ~np.isnan(want)
        assert np.array_equal(np.isnan(back), np.isnan(want))
        if m.any():
            # 0.5/scale quantization + float32 ulp slack (~6e-5 at ~600 m)
            assert np.abs(back[m] - want[m]).max() <= 0.5 / r["z_scale"] + 1e-4
            checked += 1
        if checked >= 5:
            break
    assert checked > 0  # sparse corpus: most tiles are all-NODATA


def test_palette_trns_gives_rgba():
    import struct
    import zlib

    import numpy as np

    from lasutility_ray.geom.png import _SIG, _chunk, decode_png

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    pal8 = np.vstack([pal, np.zeros((253, 3), np.uint8)])[:3]  # keep 3 entries
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(2))
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    data = (
        _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal8.tobytes())
        + _chunk(b"tRNS", bytes([0, 128]))  # entry 0 clear, 1 half, 2 opaque
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (2, 3, 4)
    assert np.array_equal(out[..., :3], pal8[idx])
    assert out[0, 0, 3] == 0 and out[0, 1, 3] == 128 and out[0, 2, 3] == 255


def test_rgb16_and_rgba16_png_decode():
    import struct
    import zlib

    import numpy as np

    from lasutility_ray.geom.png import _SIG, _chunk, decode_png

    rng = np.random.default_rng(8)
    for c, color in ((3, 2), (4, 6)):
        img = rng.integers(0, 65536, (6, 5, c), dtype=np.uint16)
        be = img.astype(">u2")
        raw = b"".join(b"\x00" + be[r].tobytes() for r in range(6))
        ihdr = struct.pack(">IIBBBBB", 5, 6, 16, color, 0, 0, 0)
        data = (
            _SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
        )
        out = decode_png(data)
        assert out.dtype == np.uint16 and out.shape == (6, 5, c)
        assert np.array_equal(out, img)


def test_dem_webp16_sink_matches_png16(ray_session, tmp_path):
    """The WebP-16 DEM sink (hi/lo bytes on the R/G channels of a
    lossless VP8L image) must read back BIT-IDENTICAL to the PNG-16
    sink on the same tiles — same quantization contract, different
    container."""
    import numpy as np

    from lasutility_ray.sources.ascii_tiles import (
        read_dem_png16,
        read_dem_webp16,
        write_dem_tiles_png16,
        write_dem_tiles_webp16,
    )
    from lasutility_ray.stages.tiling import points_dataset
    from lasutility_ray.stages.tin import tin_tiles

    pts = points_dataset(
        rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    )
    tiles = tin_tiles(pts, include_rasters=True).materialize()
    man_p = write_dem_tiles_png16(tiles, str(tmp_path / "p16")).to_pandas()
    man_w = write_dem_tiles_webp16(tiles, str(tmp_path / "w16")).to_pandas()
    assert len(man_p) == len(man_w) == tiles.count()
    mp = man_p.set_index("tile_id")
    checked = 0
    for _, r in man_w.iterrows():
        p = mp.loc[r["tile_id"]]
        assert p["z_offset"] == r["z_offset"] and p["z_scale"] == r["z_scale"]
        a = read_dem_webp16(r["path"], r["z_offset"], r["z_scale"])
        b = read_dem_png16(p["path"], p["z_offset"], p["z_scale"])
        assert a.shape == b.shape
        assert np.array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        assert np.array_equal(a[m], b[m])
        if m.any():
            checked += 1
        if checked >= 5:
            break
    assert checked > 0
