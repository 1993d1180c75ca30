"""WARC (Web ARChive, ISO 28500) reader/writer — from scratch against
the PUBLIC spec (the WARC/1.0 record grammar is published in the ISO
28500 draft and the IIPC warc-specifications repo; gzip framing is
RFC 1952 via the stdlib).

This is the canonical Common-Crawl container: response records carry
an HTTP/1.1 message whose body is the page's html, one gzip member
per record so a reader can split a petabyte .warc.gz at member
boundaries. Scope mirrors the repo's other containers: the RECORD
layer is fully real (headers, Content-Length framing, multi-member
gzip, warcinfo/request/response types, deterministic record IDs);
nothing about HTTP semantics beyond the response status line +
entity headers is interpreted.

Ray integration: ``pages_to_warc`` / ``warc_to_pages`` are Arrow
``map_batches`` transforms (one WARC blob per batch — at corpus scale
a batch IS a shard, so the sink writes independent resumable members
and the source parallelizes per blob). ``write_warc_files`` /
``read_warc_pages`` are the file-based pair built on
``ray.data.read_binary_files`` (one file per block — the standard
CC layout of ~1 GiB .warc.gz shards).

Reference parity: the reference repo has no web containers; this
extends the Common-Crawl input surface (BASELINE.json input_hint:
url, warc_ts, html, text, lang). Fuzz contract: malformed input
raises only :class:`WarcDataError`.
"""

from __future__ import annotations

import gzip
import hashlib
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa


class WarcDataError(ValueError):
    """Malformed / truncated WARC stream."""


_SOFTWARE = b"lasutility-ray/1.0"


def _warc_date(ts_ms: int) -> bytes:
    dt = datetime.fromtimestamp(ts_ms / 1000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ").encode()


def _parse_warc_date(s: bytes) -> int:
    try:
        dt = datetime.strptime(s.decode("ascii"), "%Y-%m-%dT%H:%M:%SZ")
    except ValueError as exc:
        raise WarcDataError(f"bad WARC-Date {s!r}") from exc
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)


def _record(warc_type: bytes, headers: list[tuple[bytes, bytes]], block: bytes) -> bytes:
    # deterministic record ID: content-addressed, so re-running a
    # failed shard reproduces identical bytes (resumable-sink rule)
    digest = hashlib.md5(warc_type + b"\0" + block).hexdigest()
    lines = [b"WARC/1.0"]
    lines.append(b"WARC-Type: " + warc_type)
    lines.append(b"WARC-Record-ID: <urn:md5:" + digest.encode() + b">")
    for k, v in headers:
        lines.append(k + b": " + v)
    lines.append(b"Content-Length: " + str(len(block)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + block + b"\r\n\r\n"


def _http_response(html: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )


def write_warc(
    records: list[dict],
    *,
    gzip_records: bool = True,
    warcinfo: bool = True,
) -> bytes:
    """Serialize page records (dicts with ``url`` str, ``ts_ms`` int,
    ``html`` bytes) as a WARC file: an optional leading warcinfo
    record, then one response record per page, each its own gzip
    member when ``gzip_records`` (the Common-Crawl layout)."""
    out = []
    if warcinfo:
        info = b"software: " + _SOFTWARE + b"\r\nformat: WARC File Format 1.0\r\n"
        out.append(
            _record(
                b"warcinfo",
                [
                    (b"WARC-Date", _warc_date(0)),
                    (b"Content-Type", b"application/warc-fields"),
                ],
                info,
            )
        )
    for r in records:
        block = _http_response(r["html"])
        out.append(
            _record(
                b"response",
                [
                    (b"WARC-Date", _warc_date(int(r["ts_ms"]))),
                    (b"WARC-Target-URI", r["url"].encode()),
                    (b"Content-Type", b"application/http; msgtype=response"),
                ],
                block,
            )
        )
    if gzip_records:
        return b"".join(
            gzip.compress(rec, compresslevel=1, mtime=0) for rec in out
        )
    return b"".join(out)


def _split_headers(data: bytes, off: int) -> tuple[dict, int]:
    end = data.find(b"\r\n\r\n", off)
    if end < 0:
        raise WarcDataError("unterminated header block")
    headers = {}
    for line in data[off:end].split(b"\r\n"):
        if b":" not in line:
            raise WarcDataError(f"malformed header line {line!r}")
        k, v = line.split(b":", 1)
        headers[k.strip().lower().decode("latin1")] = v.strip()
    return headers, end + 4


def read_warc(data: bytes) -> list[dict]:
    """Parse a WARC file (plain or multi-member gzip) into record
    dicts: ``warc_type``, ``url``, ``ts_ms``, ``headers`` plus — for
    HTTP response records — ``status``, ``http_headers`` and the
    entity ``payload``. Content-Length does the framing, exactly as
    the spec requires (no sync scanning)."""
    if data[:2] == b"\x1f\x8b":
        import zlib

        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error) as exc:
            raise WarcDataError(f"bad gzip framing: {exc}") from exc
    records = []
    off = 0
    while off < len(data):
        if data[off : off + 5] != b"WARC/":
            raise WarcDataError(f"expected WARC version line at byte {off}")
        line_end = data.find(b"\r\n", off)
        if line_end < 0:
            raise WarcDataError("unterminated version line")
        version = data[off + 5 : line_end]
        if not version.startswith((b"1.0", b"1.1")):
            raise WarcDataError(f"unsupported WARC version {version!r}")
        headers, body = _split_headers(data, line_end + 2)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcDataError("missing/invalid Content-Length") from exc
        if body + length > len(data):
            raise WarcDataError("record block overruns file")
        block = data[body : body + length]
        if data[body + length : body + length + 4] != b"\r\n\r\n":
            raise WarcDataError("missing record separator")
        off = body + length + 4
        rec: dict = {
            "warc_type": headers.get("warc-type", b"").decode("latin1"),
            "headers": headers,
            "url": headers.get("warc-target-uri", b"").decode("latin1"),
            "ts_ms": _parse_warc_date(headers["warc-date"])
            if "warc-date" in headers
            else None,
        }
        ctype = headers.get("content-type", b"")
        if rec["warc_type"] == "response" and ctype.startswith(b"application/http"):
            if not block.startswith(b"HTTP/"):
                raise WarcDataError("response block is not an HTTP message")
            sl_end = block.find(b"\r\n")
            parts = block[:sl_end].split(b" ", 2)
            if len(parts) < 2 or not parts[1].isdigit():
                raise WarcDataError(f"bad HTTP status line {block[:sl_end]!r}")
            rec["status"] = int(parts[1])
            http_headers, payload_off = _split_headers(block, sl_end + 2)
            rec["http_headers"] = http_headers
            rec["payload"] = block[payload_off:]
        else:
            rec["payload"] = block
        records.append(rec)
    return records


# --------------------------------------------------- Arrow transforms


def pages_to_warc(batch: pa.Table) -> pa.Table:
    """Sink transform: one WARC blob per Arrow batch (a batch = a
    shard; members are independently-gzipped so shards concatenate
    into one .warc.gz without re-framing)."""
    urls = batch.column("url").to_pylist()
    ts = batch.column("warc_ts").cast(pa.timestamp("ms")).cast(pa.int64()).to_pylist()
    htmls = batch.column("html").to_pylist()
    blob = write_warc(
        [
            {"url": u, "ts_ms": t, "html": h}
            for u, t, h in zip(urls, ts, htmls)
        ]
    )
    return pa.table({"warc": pa.array([blob], pa.large_binary())})


def warc_to_pages(batch: pa.Table) -> pa.Table:
    """Source transform: WARC blobs -> page rows (url, warc_ts, html).
    warcinfo/request records are metadata, not pages — skipped."""
    urls, ts, htmls = [], [], []
    for blob in batch.column("warc").to_pylist():
        for rec in read_warc(blob):
            if rec["warc_type"] != "response":
                continue
            urls.append(rec["url"])
            ts.append(rec["ts_ms"])
            htmls.append(rec["payload"])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.array(ts, np.int64).astype("datetime64[ms]").astype("datetime64[us]")
            ),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def write_warc_files(ds, out_dir: str) -> list[str]:
    """Write one .warc.gz per block under ``out_dir`` (the CC shard
    layout). Deterministic names come from each shard's content hash,
    so a rerun overwrites byte-identical files — resumable."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        blob = pages_to_warc(t).column("warc")[0].as_py()
        name = hashlib.md5(blob).hexdigest()[:16]
        path = os.path.join(out_dir, f"shard-{name}.warc.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string())})

    return sorted(
        ds.map_batches(write_shard, batch_format="pyarrow").to_pandas()["path"]
    )


def read_warc_pages(paths: list[str] | str):
    """File-based source: .warc(.gz) shards -> a pages Dataset
    (url, warc_ts, html), one read task per file."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        return warc_to_pages(
            pa.table({"warc": t.column("bytes").cast(pa.large_binary())})
        )

    return files.map_batches(parse, batch_format="pyarrow")
