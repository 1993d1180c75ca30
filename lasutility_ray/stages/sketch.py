"""Approximate/sketch aggregates for web-scale columns.

The reference has no sketches (SURVEY.md §2.5); a 10^12-row engine
needs mergeable ones. HyperLogLog here is the canonical shape: the
per-batch partial is a 2^p-register array, the shuffle carries ONE
row of registers per batch (never values), and the final combine is
an element-wise max — associative, commutative, any partition order.

Deterministic splitmix64 hashing makes the estimate reproducible
across runs/partitionings (pytest pins the estimate vs the exact
count; rows-only in the driver — no SQL engine shares our registers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 12  # 4096 registers, ~1.6% standard error


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if pa.types.is_integer(col.type):
        return _splitmix64(col.to_numpy(zero_copy_only=False).astype(np.int64))
    # strings: full-content hash (the shingle prefix hash systematically
    # collides distinct long strings sharing a 16-byte prefix + length —
    # typical URLs — which breaks the HLL error bound). blake2b runs
    # once per UNIQUE value in the batch, not per row.
    import hashlib

    uniq, inv = np.unique(np.asarray(col.to_pylist(), dtype=object), return_inverse=True)
    h = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode("utf-8", "surrogatepass"),
                                           digest_size=8).digest(), "little")
            for s in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return h[inv]


def hll_registers(values: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """uint8 register array for one batch of 64-bit hashes."""
    m = 1 << p
    idx = (values >> np.uint64(64 - p)).astype(np.int64)
    rest = values << np.uint64(p) | np.uint64(1 << (p - 1))  # sentinel stops clz
    # rank = leading zeros of the remaining bits + 1
    lz = np.zeros(len(values), dtype=np.uint8)
    cur = rest.copy()
    mask = np.ones(len(values), dtype=bool)
    for _ in range(64):
        mask &= (cur >> np.uint64(63)) == 0  # stop once the top bit is 1
        if not mask.any():
            break
        lz[mask] += 1
        cur = cur << np.uint64(1)
    rank = lz + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range linear counting."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    e = alpha * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)  # linear counting
    return float(e)


def hll_count_distinct(ds, col: str, p: int = HLL_P):
    """One-row result {estimate, n_registers}: per-batch register
    partials -> element-wise max combine. The shuffle moves 4 KB per
    batch regardless of batch size."""

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_registers(_hash_column(t.column(col)), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    combined = np.zeros(1 << p, dtype=np.uint8)
    for row in parts:
        combined = np.maximum(combined, np.frombuffer(row["regs"], dtype=np.uint8))
    return pd.DataFrame(
        {
            "estimate": [round(hll_estimate(combined), 2)],
            "n_registers": [1 << p],
        }
    )


# ------------------------------------------------- Misra-Gries top-k

MG_CAPACITY = 4096


def _mg_truncate(tokens: np.ndarray, counts: np.ndarray, capacity: int):
    """Misra-Gries reduction: keep the ``capacity`` largest counters
    after subtracting the (capacity+1)-th largest count from everyone
    (the classic decrement step, batched). Returns (tokens, counts,
    error) where ``error`` is the amount subtracted — every surviving
    estimate undercounts its true value by at most the accumulated
    error."""
    if len(tokens) <= capacity:
        return tokens, counts, 0
    order = np.argsort(counts)[::-1]
    thr = int(counts[order[capacity]])
    keep = order[:capacity]
    kept = counts[keep] - thr
    m = kept > 0
    return tokens[keep][m], kept[m], thr


def heavy_hitters(
    ds,
    text_col: str = "text",
    k: int = 20,
    capacity: int = MG_CAPACITY,
):
    """Approximate global top-k tokens via mergeable Misra-Gries
    summaries. Unlike the exact wordcount (``chunking.token_topk``,
    which ships every distinct token of every batch through the
    shuffle), each batch contributes AT MOST ``capacity`` counters, so
    the exchange volume is bounded by capacity x batches regardless of
    vocabulary size.

    Guarantee (standard MG): for every token,
    ``est <= true <= est + max_error``, and any token whose true count
    exceeds ``max_error`` is present in the summary. ``max_error``
    (the sum of all truncation decrements, a sketch property, NOT per
    token) is reported on every output row; with ``capacity`` >>
    corpus distinct tokens it is 0 and the result is exact.

    Returns a pandas DataFrame (rank, token, est_count, max_error)
    sorted by (est desc, token asc), rows = top-k of the summary."""
    import re

    from ray.data.aggregate import Sum

    pat = re.compile(r"[a-z0-9]+")

    def partial(t: pa.Table) -> pa.Table:
        toks = t.column(text_col).to_pandas().str.lower().str.findall(pat)
        lens = toks.map(len).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "err": pa.array([], pa.int64()),
                }
            )
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        uniq, counts = np.unique(flat, return_counts=True)
        uniq, counts, err = _mg_truncate(uniq, counts.astype(np.int64), capacity)
        errs = np.zeros(len(uniq), dtype=np.int64)
        out = pa.table(
            {
                "token": pa.array(uniq, pa.string()),
                "n": pa.array(counts, pa.int64()),
                "err": pa.array(errs, pa.int64()),
            }
        )
        if err:
            # the decrement rides as one side-band row so the global
            # error bound survives the merge (token "" never tokenizes)
            out = pa.concat_tables(
                [
                    out,
                    pa.table(
                        {
                            "token": pa.array([""], pa.string()),
                            "n": pa.array([0], pa.int64()),
                            "err": pa.array([int(err)], pa.int64()),
                        }
                    ),
                ]
            )
        return out

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"), Sum("err", alias_name="err"))
        .to_pandas()
    )
    if merged.empty:  # zero tokens in the corpus: Ray returns a
        # column-less empty frame, so build the schema explicitly
        return pd.DataFrame(
            {
                "rank": pd.Series([], dtype="int64"),
                "token": pd.Series([], dtype="object"),
                "est_count": pd.Series([], dtype="int64"),
                "max_error": pd.Series([], dtype="int64"),
            }
        )
    # the merged counter table is capacity x batches at worst — apply
    # one final MG truncation to the capacity, then take top-k
    max_error = int(merged["err"].sum())
    merged = merged[merged["token"] != ""]
    tokens = merged["token"].to_numpy()
    counts = merged["n"].to_numpy(dtype=np.int64)
    tokens, counts, err2 = _mg_truncate(tokens, counts, capacity)
    max_error += int(err2)
    df = pd.DataFrame({"token": tokens, "est_count": counts})
    df = df.sort_values(
        ["est_count", "token"], ascending=[False, True], kind="stable"
    ).head(k)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df["max_error"] = np.int64(max_error)
    return df[["rank", "token", "est_count", "max_error"]].reset_index(drop=True)


# ------------------------------------------------- count-min sketch

CMS_WIDTH = 2048
CMS_DEPTH = 4


def cms_cells(values_hashed: np.ndarray, width: int = CMS_WIDTH,
              depth: int = CMS_DEPTH) -> np.ndarray:
    """Row-local CMS cell ids for pre-hashed values: depth rows, each
    with an independent splitmix64 re-hash, flattened to
    ``row * width + col`` (one int per (value, row))."""
    cells = np.empty((depth, len(values_hashed)), dtype=np.int64)
    h = values_hashed.copy()
    for d in range(depth):
        h = _splitmix64(h + np.uint64(d + 0x9E37))
        cells[d] = (d * width + (h % np.uint64(width))).astype(np.int64)
    return cells.reshape(-1)


def cms_build(ds, col: str, width: int = CMS_WIDTH, depth: int = CMS_DEPTH):
    """Distributed count-min sketch over ``col``: per-batch partial
    cell counts (at most width*depth rows per batch on the wire —
    bounded, corpus-size-independent) -> one groupby-sum. Returns the
    dense (depth, width) int64 matrix.

    Mergeability is addition, so the construction is exactly
    partitioning-independent; the estimate's one-sided error bound
    (est >= true; est <= true + 2N/width w.p. 1 - 2^-depth) is the
    public CMS guarantee and pinned in tests."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        h = _hash_column(t.column(col))
        cells = cms_cells(h, width, depth)
        nz, cnt = np.unique(cells, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(nz, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    m = np.zeros(depth * width, dtype=np.int64)
    if len(agg):
        m[agg["cell"].to_numpy(np.int64)] = agg["n"].to_numpy(np.int64)
    return m.reshape(depth, width)


def cms_estimate(matrix: np.ndarray, queries: pa.Array) -> np.ndarray:
    """Point-frequency estimates: min over depth rows."""
    depth, width = matrix.shape
    h = _hash_column(queries)
    cells = cms_cells(h, width, depth).reshape(depth, -1)
    ests = matrix.reshape(-1)[cells]
    return ests.min(axis=0)


def hll_group_distinct(ds, group_col: str, value_col: str, p: int = 10):
    """Approximate DISTINCT ``value_col`` per ``group_col`` value:
    per-batch per-group register partials (one 2^p-byte blob per
    (batch, group) on the wire — bounded regardless of row count),
    combined by element-wise max inside one groupby. The scalable
    form of ``SELECT g, count(DISTINCT v)`` when the exact answer
    would shuffle every distinct pair.

    Returns (group, estimate float, n_registers). Max-merge makes the
    result exactly partitioning-independent."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_pandas()
        h = _hash_column(t.column(value_col))
        groups, codes = np.unique(g.to_numpy(), return_inverse=True)
        blobs = []
        for gi in range(len(groups)):
            blobs.append(hll_registers(h[codes == gi], p).tobytes())
        return pa.table(
            {
                group_col: pa.array(groups),
                "regs": pa.array(blobs, pa.large_binary()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for b in df["regs"]:
            regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
        return pd.DataFrame(
            {
                group_col: df[group_col].iloc[:1],
                "estimate": [round(hll_estimate(regs), 2)],
                "n_registers": [np.int64(1 << p)],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(combine, batch_format="pandas")
    )
