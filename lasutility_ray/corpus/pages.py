"""Synthetic Common-Crawl-style pages + the reference text extractor.

``pages`` schema per BASELINE.json input_hint:
``url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string`` (+ ``doc_id`` carried as the join/geocode key).

The html template wraps ``text`` between fixed markers; the engine's
extractor must recover ``text`` *byte-identical per url* (the
per-row invariant in BASELINE.json). Duplicate injection: every
``doc_id`` with ``doc_id % DUP_EVERY == DUP_EVERY-1`` repeats the
text of ``doc_id - 1`` under a different url, giving exact-dedup
fixtures at every scale.

All derivations are DuckDB-mirrorable (``printf``, string concat,
``epoch_ms``); see ``sql_exprs``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .geocode import hashes

EPOCH_MS = 1672531200000  # 2023-01-01T00:00:00Z
DUP_EVERY = 25  # 4% exact duplicates

HTML_PREFIX = (
    '<html><head><title>doc</title></head><body>'
    '<nav>home | about | contact</nav><main><p>'
)
HTML_SUFFIX = "</p></main><footer>(c) example</footer></body></html>"

_WORDS = (
    "data ray tile point cloud raster vector join index grid scan "
    "batch block shuffle stream merge sort hash key value page web "
    "crawl text token lang doc query plan group agg window"
).split()


def make_urls(doc_id: np.ndarray) -> np.ndarray:
    h1, _ = hashes(doc_id)
    sites = (doc_id % 1000).astype(np.int64)
    return np.array(
        [f"https://site{s}.example/{h:08x}" for s, h in zip(sites.tolist(), h1.tolist())],
        dtype=object,
    )


NEAR_DUP_SLOT = 12
NEAR_DUP_TAIL = " appended near duplicate tail words"


def synth_text(doc_id: np.ndarray) -> np.ndarray:
    """Deterministic word-salad text; length varies by hash.
    Duplicate fixtures at every scale: ``doc_id % 25 == 24`` copies
    the previous row's text verbatim (exact dup, different url);
    ``doc_id % 25 == 12`` copies the previous row's text + a short
    tail (near dup, Jaccard ~0.9)."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    mod = doc_id % DUP_EVERY
    base = np.where((mod == DUP_EVERY - 1) | (mod == NEAR_DUP_SLOT), doc_id - 1, doc_id)
    h1, h2 = hashes(base)
    out = np.empty(len(doc_id), dtype=object)
    for i, (a, c, m) in enumerate(zip(h1.tolist(), h2.tolist(), mod.tolist())):
        n_words = 20 + (a % 80)
        idx = (np.arange(n_words) * (1 + c % 7) + a) % len(_WORDS)
        # leading token d<h1:08x> is unique per base doc (h1 is a
        # bijection of doc_id), so the only exact/near duplicates are
        # the injected ones
        t = f"d{a:08x} " + " ".join(_WORDS[j] for j in idx)
        if m == NEAR_DUP_SLOT:
            t += NEAR_DUP_TAIL
        out[i] = t
    return out


def pages_from_documents(batch: pa.Table) -> pa.Table:
    """Arrow batch transform: documents(doc_id, text, lang, ...) ->
    pages(doc_id, url, warc_ts, html, text, lang). Used both by the
    engine and reproduced by the DuckDB oracle."""
    doc_id = batch.column("doc_id").to_numpy()
    text = batch.column("text").to_pylist()
    urls = make_urls(doc_id)
    ts = (EPOCH_MS + (doc_id % 86400) * 1000).astype("datetime64[ms]").astype("datetime64[us]")
    html = [(HTML_PREFIX + t + HTML_SUFFIX).encode() for t in text]
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": batch.column("text"),
            "lang": batch.column("lang"),
        }
    )


def synth_pages_batch(doc_id: np.ndarray) -> pa.Table:
    """Standalone pages batch at arbitrary scale (bench corpus)."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    text = synth_text(doc_id)
    urls = make_urls(doc_id)
    ts = (EPOCH_MS + (doc_id % 86400) * 1000).astype("datetime64[ms]").astype("datetime64[us]")
    langs = np.array(["fi", "en", "sv", "de"], dtype=object)[doc_id % 4]
    html = [(HTML_PREFIX + t + HTML_SUFFIX).encode() for t in text.tolist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def extract_text_from_html(html_col: pa.Array) -> pa.Array:
    """The engine's extractor: recover the payload between the fixed
    markers. Must be byte-identical to the ``text`` column per url."""
    import pyarrow.compute as pc

    s = pc.cast(html_col, pa.string())
    # strip the fixed-length prefix (slice start is scalar-only in
    # Arrow, so the fixed suffix is stripped via reverse-slice-reverse
    # — all three kernels are vectorized)
    big = 2**30
    trimmed = pc.utf8_slice_codeunits(s, len(HTML_PREFIX), big)
    rev = pc.utf8_reverse(trimmed)
    rev_cut = pc.utf8_slice_codeunits(rev, len(HTML_SUFFIX), big)
    return pc.utf8_reverse(rev_cut)


def url_sql(doc_col: str = "doc_id") -> str:
    h1 = f"(({doc_col} * 2654435761) % 4294967296)"
    return (
        f"('https://site' || CAST({doc_col} % 1000 AS VARCHAR) || '.example/' "
        f"|| printf('%08x', {h1}))"
    )


def warc_ts_sql(doc_col: str = "doc_id") -> str:
    return f"epoch_ms({EPOCH_MS} + ({doc_col} % 86400) * 1000)"
