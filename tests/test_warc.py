"""WARC (ISO 28500) container tests: record-layer round trips,
Common-Crawl gzip-member framing, HTTP response parsing, the Arrow
batch transforms, the file-based Ray source/sink pair, and the
repo-wide fuzz contract."""

import gzip

import numpy as np
import pyarrow as pa
import pytest

from lasutility_ray.sources.warc import (
    WarcDataError,
    pages_to_warc,
    read_warc,
    read_warc_pages,
    warc_to_pages,
    write_warc,
    write_warc_files,
)

PAGES = [
    {"url": "https://a.example/1", "ts_ms": 1672531200000, "html": b"<p>one</p>"},
    {"url": "https://b.example/2", "ts_ms": 1672531261000, "html": b"<p>two</p>"},
    {"url": "https://c.example/3", "ts_ms": 1672617599000, "html": b"\xe2\x82\xac"},
]


@pytest.mark.parametrize("gz", [False, True])
def test_round_trip_plain_and_gzip(gz):
    blob = write_warc(PAGES, gzip_records=gz)
    recs = read_warc(blob)
    assert recs[0]["warc_type"] == "warcinfo"
    responses = [r for r in recs if r["warc_type"] == "response"]
    assert len(responses) == 3
    for r, p in zip(responses, PAGES):
        assert r["url"] == p["url"]
        assert r["ts_ms"] == p["ts_ms"]
        assert r["payload"] == p["html"]
        assert r["status"] == 200
        assert r["http_headers"]["content-type"] == b"text/html; charset=UTF-8"
        assert int(r["http_headers"]["content-length"]) == len(p["html"])


def test_deterministic_bytes_and_content_addressed_ids():
    a = write_warc(PAGES)
    b = write_warc(PAGES)
    assert a == b  # resumable-sink rule: reruns are byte-identical
    ids = [r["headers"]["warc-record-id"] for r in read_warc(a)]
    assert len(set(ids)) == len(ids)
    assert all(i.startswith(b"<urn:md5:") for i in ids)


def test_concatenated_gzip_shards_parse_as_one_stream():
    """CC shards concatenate: each record is its own gzip member, so
    cat a.warc.gz b.warc.gz is itself a valid .warc.gz."""
    a = write_warc(PAGES[:2], warcinfo=False)
    b = write_warc(PAGES[2:], warcinfo=False)
    recs = read_warc(a + b)
    assert [r["url"] for r in recs] == [p["url"] for p in PAGES]


def test_arrow_transforms_round_trip_with_extractor():
    from lasutility_ray.corpus.pages import (
        extract_text_from_html,
        synth_pages_batch,
    )

    pages = synth_pages_batch(np.arange(40, dtype=np.int64))
    back = warc_to_pages(pages_to_warc(pages))
    assert back.num_rows == 40
    assert back.column("url").to_pylist() == pages.column("url").to_pylist()
    assert back.column("warc_ts").to_pylist() == pages.column("warc_ts").to_pylist()
    assert back.column("html").to_pylist() == pages.column("html").to_pylist()
    # the per-row invariant: extracted text byte-identical per url
    text = extract_text_from_html(back.column("html").combine_chunks())
    assert text.to_pylist() == pages.column("text").to_pylist()


def test_ray_file_sink_source_round_trip(ray_session, tmp_path):
    import ray.data as rd

    from lasutility_ray.corpus.pages import synth_pages_batch

    pages = synth_pages_batch(np.arange(100, dtype=np.int64))
    ds = rd.from_arrow(pages).repartition(4)
    paths = write_warc_files(ds, str(tmp_path / "warc"))
    assert len(paths) == 4
    assert all(p.endswith(".warc.gz") for p in paths)
    back = read_warc_pages(paths).to_pandas().sort_values("url").reset_index(drop=True)
    orig = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == list(orig["url"])
    assert list(back["warc_ts"]) == list(orig["warc_ts"])
    assert [bytes(h) for h in back["html"]] == [bytes(h) for h in orig["html"]]


def test_fuzz_truncation_and_bitflips_raise_typed_errors():
    for gz in (False, True):
        blob = write_warc(PAGES, gzip_records=gz)
        for cut in range(0, len(blob), 7):
            try:
                read_warc(blob[:cut])
            except WarcDataError:
                pass
        rng = np.random.default_rng(2)
        buf = bytearray(blob)
        for _ in range(300):
            i = int(rng.integers(len(buf)))
            old = buf[i]
            buf[i] ^= 1 << int(rng.integers(8))
            try:
                read_warc(bytes(buf))
            except WarcDataError:
                pass
            buf[i] = old


def test_malformed_structures_rejected():
    with pytest.raises(WarcDataError, match="version"):
        read_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    good = write_warc(PAGES[:1], gzip_records=False, warcinfo=False)
    # corrupt Content-Length framing
    bad = good.replace(b"Content-Length", b"X-Content-Length", 1)
    with pytest.raises(WarcDataError, match="Content-Length"):
        read_warc(bad)
    with pytest.raises(WarcDataError, match="gzip"):
        read_warc(b"\x1f\x8b" + b"\x00" * 30)


def test_non_response_records_are_not_pages():
    blob = write_warc(PAGES, warcinfo=True)
    t = warc_to_pages(pa.table({"warc": pa.array([blob], pa.large_binary())}))
    assert t.num_rows == 3  # warcinfo skipped
