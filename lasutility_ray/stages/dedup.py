"""Deduplication operators over the documents/pages corpus.

Five families (each a first-class ``queries()`` entry):

- **exact**: content hash (md5) -> hash-partitioned first-wins.
  Map-side partial (min doc_id per hash per batch) shrinks the
  shuffle to one row per (batch, hash) — at 100 TB the shuffle moves
  only hashes, never text.
- **MinHash + LSH**: word-shingle -> 64 minhash permutations -> 16
  bands of 4 -> ``groupby(band_key)`` bucket join -> candidate pairs
  -> exact-Jaccard verification. Banded groupby is the only wide
  step; verification joins shingle signatures co-grouped with the
  candidates.
- **SimHash**: 64-bit simhash over word features; candidates share
  one of four 16-bit chunks; verified by Hamming distance <= 3.
- **n-gram Jaccard**: exact Jaccard over word 3-gram sets within
  cheap prefix buckets (first token) — the brute-force baseline.
- **embedding cosine**: exact all-pairs cosine >= threshold over the
  embeddings table (numpy matmul per batch against a broadcast
  matrix) — DuckDB-checkable; the LSH-bucketed variant
  (hyperplane signs) is the scale path.

Pair outputs are always ``(a, b)`` with ``a < b``, deduplicated.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = 4
MERSENNE = (1 << 61) - 1
JACCARD_THRESHOLD = 0.8
HAMMING_MAX = 3
COSINE_THRESHOLD = 0.95

# shingle hashes are 32-bit and a < 2^31 so a*x + b < 2^63 + 2^61
# stays inside uint64 (see minhash_signature)
_rng = np.random.default_rng(42)
_PERM_A = (_rng.integers(1, 1 << 31, N_PERM, dtype=np.int64)).astype(np.uint64)
_PERM_B = (_rng.integers(0, MERSENNE, N_PERM, dtype=np.int64)).astype(np.uint64)


# ----------------------------------------------------------- exact


def _md5_hex(texts) -> np.ndarray:
    return np.array([hashlib.md5(t.encode()).hexdigest() for t in texts], dtype=object)


def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = _md5_hex(batch.column(text_col).to_pylist())
    return batch.append_column("text_hash", pa.array(h, pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Survivors of exact dedup: min id per content hash.

    map-side partial -> tiny groupby; returns (text_hash, keep_id,
    n_copies)."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = add_text_hash(batch, text_col)
        df = t.select([id_col, "text_hash"]).to_pandas()
        agg = (
            df.groupby("text_hash", sort=False)[id_col]
            .agg(["min", "count"])
            .reset_index()
            .rename(columns={"min": "pmin", "count": "pcount"})
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("pmin", alias_name="keep_id"), Sum("pcount", alias_name="n_copies"))
    )


# ----------------------------------------------------------- minhash


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles -> 32-bit hashes (deterministic, md5-based)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
    return out


def minhash_signature(text: str) -> np.ndarray:
    """64 min-hash values via universal hashing (a*x+b mod 2^61-1);
    x < 2^32 and a < 2^31 keep every product inside uint64."""
    sh = _shingle_hashes(text)
    vals = (sh[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % MERSENNE
    return vals.min(axis=0)


def minhash_band_rows(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Explode each doc into N_BANDS (band_id, band_hash, id) rows."""
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    band_ids = []
    band_hashes = []
    out_ids = []
    for i, t in enumerate(texts):
        sig = minhash_signature(t)
        for b in range(N_BANDS):
            chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
            band_ids.append(b)
            band_hashes.append(h)
            out_ids.append(ids[i])
    return pa.table(
        {
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.string()),
            "id": pa.array(out_ids, pa.int64()),
        }
    )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[a], "b": ids[b]})


def minhash_candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text"):
    """LSH candidate pairs (a < b), deduplicated across bands."""
    bands = ds.map_batches(
        lambda t: minhash_band_rows(t, id_col, text_col), batch_format="pyarrow"
    )
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        threshold: float = JACCARD_THRESHOLD):
    """Verified near-dup pairs: LSH candidates + exact Jaccard.

    Verification broadcasts the candidate docs' texts (the candidate
    set is tiny relative to the corpus; at larger candidate volumes
    this becomes a co-grouped join on id)."""
    cands = minhash_candidate_pairs(ds, id_col, text_col).to_pandas()
    if len(cands) == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    need = set(cands["a"].tolist()) | set(cands["b"].tolist())
    need_ref = ray.put(need)

    def pick(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        ids = batch.column(id_col).to_numpy()
        mask = np.isin(ids, np.fromiter(wanted, dtype=np.int64))
        return batch.filter(pa.array(mask)).select([id_col, text_col])

    texts = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    lookup = dict(zip(texts[id_col], texts[text_col]))
    jac = np.array([jaccard(lookup[a], lookup[b]) for a, b in zip(cands["a"], cands["b"])])
    out = cands.assign(jaccard=jac)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# ----------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (md5 word hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for w in text.split():
        h = np.uint64(int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big"))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = HAMMING_MAX):
    """Near-dup pairs by SimHash: bucket on each of four 16-bit
    chunks (any pair within Hamming<=3 of a 64-bit hash shares at
    least one exact chunk by pigeonhole), verify Hamming distance."""

    def to_chunks(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sims = np.fromiter(
            (simhash64(t) for t in batch.column(text_col).to_pylist()),
            dtype=np.uint64,
            count=batch.num_rows,
        )
        rows_id, rows_chunk, rows_key, rows_sim = [], [], [], []
        for c in range(4):
            key = (sims >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            rows_id.extend(ids.tolist())
            rows_chunk.extend([c] * len(ids))
            rows_key.extend(key.tolist())
            rows_sim.extend(sims.astype(np.int64).tolist())
        return pa.table(
            {
                "id": pa.array(rows_id, pa.int64()),
                "chunk": pa.array(rows_chunk, pa.int32()),
                "key": pa.array(rows_key, pa.int64()),
                "simhash": pa.array(rows_sim, pa.int64()),
            }
        )

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id").sort_values("id")
        if len(g) < 2:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("a", "b", "hamming")}
            )
        ids = g["id"].to_numpy()
        sims = g["simhash"].to_numpy().astype(np.uint64)
        ai, bi = np.triu_indices(len(ids), k=1)
        x = sims[ai] ^ sims[bi]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        m = ham <= max_hamming
        return pd.DataFrame({"a": ids[ai][m], "b": ids[bi][m], "hamming": ham[m]})

    chunks = ds.map_batches(to_chunks, batch_format="pyarrow")
    pairs = chunks.groupby(["chunk", "key"]).map_groups(bucket, batch_format="pandas")
    return pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


# ------------------------------------------------- n-gram jaccard


def ngram_jaccard_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        threshold: float = 0.5):
    """Exact word-3-gram Jaccard within first-token buckets — the
    brute-force near-dup baseline (bucket key keeps it sub-O(n^2))."""

    def keyed(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        first = [t.split(" ", 1)[0] if t else "" for t in texts]
        return batch.select([id_col, text_col]).append_column(
            "bucket", pa.array(first, pa.string())
        )

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        texts = g[text_col].tolist()
        if len(ids) < 2:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                 "jaccard": pd.Series(dtype="float64")}
            )
        out_a: list = []
        out_b: list = []
        out_j: list = []
        shingles = [set(_shingle_hashes(t).tolist()) for t in texts]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(shingles[i] & shingles[j])
                union = len(shingles[i] | shingles[j])
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(jac)
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype="int64"),
             "b": pd.Series(out_b, dtype="int64"),
             "jaccard": pd.Series(out_j, dtype="float64")}
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket, batch_format="pandas")
    )


# --------------------------------------------- embedding near-dup


def embedding_nn_pairs(ds, threshold: float = COSINE_THRESHOLD):
    """Exact all-pairs cosine >= threshold over the embeddings table.

    The (small-side) full matrix is broadcast once; each batch does
    one float64 matmul against it — the brute-force baseline that the
    DuckDB oracle reproduces. Output (a, b, cosine) with a < b,
    cosine rounded to 6 dp for cross-engine float stability."""
    full = ds.to_pandas()
    ids_all = full["vec_id"].to_numpy()
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    matn = mat / norms[:, None]
    ref = ray.put((ids_all, matn))

    def probe(batch: pa.Table) -> pa.Table:
        ids_a, m = ray.get(ref)
        ids = batch.column("vec_id").to_numpy()
        vecs = np.stack(batch.column("embedding").to_numpy()).astype(np.float64)
        vecs = vecs / np.linalg.norm(vecs, axis=1)[:, None]
        sims = vecs @ m.T
        pi, qi = np.nonzero(sims >= threshold)
        keep = ids[pi] < ids_a[qi]  # a < b, no self pairs
        return pa.table(
            {
                "a": pa.array(ids[pi][keep], pa.int64()),
                "b": pa.array(ids_a[qi][keep], pa.int64()),
                "cosine": pa.array(np.round(sims[pi, qi][keep], 6), pa.float64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def embedding_lsh_pairs(ds, n_planes: int = 8, threshold: float = COSINE_THRESHOLD):
    """Scale path: hyperplane-LSH buckets (sign bits of n_planes
    fixed random projections), exact cosine verified within buckets.
    May miss pairs across buckets — rows-only check by design."""
    rng = np.random.default_rng(7)
    planes = rng.standard_normal((64, n_planes))
    planes_ref = ray.put(planes)

    def keyed(batch: pa.Table) -> pa.Table:
        p = ray.get(planes_ref)
        vecs = np.stack(batch.column("embedding").to_numpy()).astype(np.float64)
        signs = (vecs @ p) > 0
        key = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(key.astype(np.int64), pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1)[:, None]
        sims = m @ m.T
        ai, bi = np.triu_indices(len(ids), k=1)
        mask = sims[ai, bi] >= threshold
        return pd.DataFrame(
            {
                "a": ids[ai][mask],
                "b": ids[bi][mask],
                "cosine": np.round(sims[ai, bi][mask], 6),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket, batch_format="pandas")
    )
