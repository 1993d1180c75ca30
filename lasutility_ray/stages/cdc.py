"""Content-defined chunking (CDC) dedup over binary columns.

Splits every document's byte payload at *content-defined* boundaries
(Gear rolling hash — Xia et al.'s FastCDC family, public algorithm)
so that shared byte runs land in identical chunks regardless of their
offset; chunk-hash grouping then finds SUB-document duplication that
whole-doc hashing cannot (the corpus' injected near-dup docs share
their leading chunks while exact-dup docs share all of them).

Vectorization: the Gear recurrence ``h_t = (h_{t-1} << 1) + g(b_t)
mod 2^64`` telescopes to a 64-term sliding dot product
``h_t = sum_{j=0..63} g(b_{t-j}) << j``, i.e. 64 shifted adds over
the whole byte array.  GEAR[0] is pinned to zero, so joining all
documents of a batch with 63 zero bytes of padding makes ONE
batch-wide convolution compute every per-document hash exactly
(padding contributes nothing, and windows truncate at document starts
just as a per-doc scan would).  Only the sparse boundary-candidate
walk (min/max chunk enforcement) touches python, over candidates,
never bytes.

100 TB shape: chunking is map-only; the shuffle carries (chunk_hash,
doc_id, offset, length) — 16-byte digests, never chunk bytes; the
dedup groupby uses Min aggregates exactly like ``stages/dedup.py``'s
exact_dedup.  No SQL oracle (a 64-term byte convolution is not
reasonably SQL-expressible) — exactness is pinned by a pure-python
byte-at-a-time reference and reassembly/determinism invariants.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# corpus-scale defaults; the driver query passes fixture-scale ones
MIN_SIZE = 2048
AVG_BITS = 13  # boundary when low 13 hash bits are zero (~8 KiB avg)
MAX_SIZE = 65536

_PAD = 63  # window length - 1


def _gear_table() -> np.ndarray:
    """256 deterministic 64-bit constants via splitmix64(seed=byte);
    GEAR[0] forced to 0 so zero padding is hash-transparent."""
    g = np.empty(256, dtype=np.uint64)
    for b in range(256):
        z = (np.uint64(b) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(2**64 - 1)
        z = np.uint64((int(z) * 0xBF58476D1CE4E5B9) % 2**64)
        z ^= z >> np.uint64(27)
        z = np.uint64((int(z) * 0x94D049BB133111EB) % 2**64)
        z ^= z >> np.uint64(31)
        g[b] = z
    g[0] = 0
    return g


GEAR = _gear_table()


def _rolling_hash(padded: np.ndarray) -> np.ndarray:
    """64-shift convolution: h[t] = sum_j GEAR[padded[t-j]] << j."""
    g = GEAR[padded]
    h = g.copy()
    for j in range(1, 64):
        h[j:] += g[:-j] << np.uint64(j)
    return h


def _boundaries(h_doc: np.ndarray, min_size: int, avg_bits: int, max_size: int):
    """Sparse candidate walk -> chunk end offsets (exclusive)."""
    n = len(h_doc)
    mask = np.uint64((1 << avg_bits) - 1)
    cand = np.nonzero((h_doc & mask) == 0)[0] + 1  # cut AFTER position
    ends = []
    pos = 0
    while pos < n:
        lo = pos + min_size
        hi = min(pos + max_size, n)
        if lo >= n:
            ends.append(n)
            break
        i = np.searchsorted(cand, lo)
        if i < len(cand) and cand[i] <= hi:
            ends.append(int(cand[i]))
        else:
            ends.append(hi)
        pos = ends[-1]
    return ends


def chunk_batch(
    t: pa.Table,
    col: str = "html",
    min_size: int = MIN_SIZE,
    avg_bits: int = AVG_BITS,
    max_size: int = MAX_SIZE,
) -> pa.Table:
    """Arrow batch -> chunk table (doc_id, chunk_idx, offset, length,
    chunk_hash md5-hex)."""
    doc_id = t.column("doc_id").to_numpy()
    payloads = t.column(col).to_pylist()
    lens = np.array([len(p) for p in payloads], dtype=np.int64)
    if lens.sum() == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "offset": pa.array([], pa.int64()),
                "length": pa.array([], pa.int64()),
                "chunk_hash": pa.array([], pa.string()),
            }
        )
    # pad each doc with 63 zero bytes; GEAR[0] == 0 keeps per-doc
    # hashes identical to independent per-doc scans
    parts = []
    for p in payloads:
        parts.append(np.frombuffer(p, dtype=np.uint8))
        parts.append(np.zeros(_PAD, dtype=np.uint8))
    h = _rolling_hash(np.concatenate(parts))
    out = {"doc_id": [], "chunk_idx": [], "offset": [], "length": [], "chunk_hash": []}
    start = 0
    for d in range(len(payloads)):
        n = int(lens[d])
        hd = h[start : start + n]
        start += n + _PAD
        if n == 0:
            continue
        pos = 0
        mv = memoryview(payloads[d])
        for ci, end in enumerate(_boundaries(hd, min_size, avg_bits, max_size)):
            out["doc_id"].append(int(doc_id[d]))
            out["chunk_idx"].append(ci)
            out["offset"].append(pos)
            out["length"].append(end - pos)
            out["chunk_hash"].append(hashlib.md5(mv[pos:end]).hexdigest())
            pos = end
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "chunk_idx": pa.array(out["chunk_idx"], pa.int64()),
            "offset": pa.array(out["offset"], pa.int64()),
            "length": pa.array(out["length"], pa.int64()),
            "chunk_hash": pa.array(out["chunk_hash"], pa.string()),
        }
    )


def cdc_chunks(
    ds,
    col: str = "html",
    min_size: int = MIN_SIZE,
    avg_bits: int = AVG_BITS,
    max_size: int = MAX_SIZE,
):
    """Per-doc chunk table (map-only, streaming)."""
    return ds.map_batches(
        lambda t: chunk_batch(t, col, min_size, avg_bits, max_size),
        batch_format="pyarrow",
    )


def cdc_dedup(
    ds,
    col: str = "html",
    min_size: int = MIN_SIZE,
    avg_bits: int = AVG_BITS,
    max_size: int = MAX_SIZE,
):
    """Chunk-level dedup: one row per distinct chunk content with its
    copy count and deterministic keeper (lexicographic min of
    (doc_id, offset)). Shuffle payload: digests + int64s only."""
    from ray.data.aggregate import Count, Min

    chunks = cdc_chunks(ds, col, min_size, avg_bits, max_size)

    def keyed(t: pa.Table) -> pa.Table:
        # pack (doc_id, offset) so one Min aggregate picks the keeper;
        # 20 offset bits bound payloads at 1 MiB and docs at 2^43
        # (raise the shift for larger blobs)
        d = t.column("doc_id").to_numpy()
        o = t.column("offset").to_numpy()
        if len(o) and int(o.max()) >= 1 << 20:
            raise ValueError("cdc_dedup keeper packing caps payloads at 1 MiB")
        return t.append_column("keep_key", pa.array(d * (1 << 20) + o, pa.int64()))

    agg = (
        chunks.map_batches(keyed, batch_format="pyarrow")
        .groupby("chunk_hash")
        .aggregate(
            Count(alias_name="n_copies"),
            Min("keep_key", alias_name="keep_key"),
            Min("length", alias_name="length"),
        )
    )

    def unpack(t: pa.Table) -> pa.Table:
        k = t.column("keep_key").to_numpy()
        return pa.table(
            {
                "chunk_hash": t.column("chunk_hash"),
                "n_copies": t.column("n_copies"),
                "keep_doc": pa.array(k >> 20, pa.int64()),
                "keep_off": pa.array(k & ((1 << 20) - 1), pa.int64()),
                "length": t.column("length"),
            }
        )

    return agg.map_batches(unpack, batch_format="pyarrow")


def reference_chunk(payload: bytes, min_size: int, avg_bits: int, max_size: int):
    """Byte-at-a-time scalar reference (the correctness definition).

    The hash is CONTINUOUS across chunk cuts (no reset): a boundary is
    a purely content-local property of the preceding <=64 bytes, which
    is exactly what the batch convolution computes and what gives CDC
    its shift-invariance."""
    mask = (1 << avg_bits) - 1
    n = len(payload)
    hs = []
    h = 0
    for b in payload:
        h = ((h << 1) + int(GEAR[b])) & (2**64 - 1)
        hs.append(h)
    ends = []
    pos = 0
    while pos < n:
        lo = pos + min_size
        hi = min(pos + max_size, n)
        if lo >= n:
            ends.append(n)
            break
        end = hi
        for t in range(lo, hi + 1):
            if (hs[t - 1] & mask) == 0:
                end = t
                break
        ends.append(end)
        pos = end
    return ends
