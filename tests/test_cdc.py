"""Content-defined chunking (stages/cdc.py): the vectorized batch
convolution vs the byte-at-a-time scalar reference, reassembly and
shift-invariance invariants, and sub-document dedup on the corpus'
injected near-duplicates."""

import numpy as np
import pandas as pd
import pyarrow as pa

from lasutility_ray.stages import cdc

SF = "/root/testdata/sf0.001"
PARAMS = dict(min_size=32, avg_bits=6, max_size=512)


def _rand_docs(rng, n_docs, max_len=1500):
    return [
        rng.integers(0, 256, int(rng.integers(0, max_len)), dtype=np.uint8).tobytes()
        for _ in range(n_docs)
    ]


def test_vectorized_matches_scalar_reference():
    rng = np.random.default_rng(11)
    docs = _rand_docs(rng, 60)
    t = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()), "html": pa.array(docs, pa.binary())}
    )
    got = cdc.chunk_batch(t, **PARAMS).to_pandas()
    rows = []
    for d, p in enumerate(docs):
        pos = 0
        for ci, e in enumerate(cdc.reference_chunk(p, 32, 6, 512)):
            rows.append((d, ci, pos, e - pos))
            pos = e
    want = pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "offset", "length"])
    pd.testing.assert_frame_equal(
        got[["doc_id", "chunk_idx", "offset", "length"]], want
    )


def test_chunks_reassemble_and_respect_bounds():
    rng = np.random.default_rng(13)
    docs = _rand_docs(rng, 40)
    t = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()), "html": pa.array(docs, pa.binary())}
    )
    ch = cdc.chunk_batch(t, **PARAMS).to_pandas()
    for d, p in enumerate(docs):
        sub = ch[ch.doc_id == d].sort_values("chunk_idx")
        if len(p) == 0:
            assert len(sub) == 0
            continue
        # contiguous cover
        assert sub["offset"].iloc[0] == 0
        assert (sub["offset"] + sub["length"]).iloc[-1] == len(p)
        assert np.array_equal(
            sub["offset"].to_numpy()[1:],
            (sub["offset"] + sub["length"]).to_numpy()[:-1],
        )
        # every chunk but the last respects min/max
        assert (sub["length"].iloc[:-1] >= 32).all()
        assert (sub["length"] <= 512).all()
        # hashes really are the content hash
        import hashlib

        for _, r in sub.iterrows():
            seg = p[r.offset : r.offset + r.length]
            assert hashlib.md5(seg).hexdigest() == r.chunk_hash


def test_shift_invariance():
    """Prepending bytes to a payload leaves the chunking of the tail
    identical once past one max_size + window — the CDC property that
    offset-based chunking lacks."""
    rng = np.random.default_rng(17)
    tail = rng.integers(0, 256, 4000, dtype=np.uint8).tobytes()
    for pre_len in (1, 7, 100):
        pre = rng.integers(0, 256, pre_len, dtype=np.uint8).tobytes()
        e1 = cdc.reference_chunk(tail, 32, 6, 512)
        e2 = cdc.reference_chunk(pre + tail, 32, 6, 512)
        # boundaries in the tail region, re-based
        sync = 512 + 64
        t1 = [e for e in e1 if e > sync]
        t2 = [e - pre_len for e in e2 if e - pre_len > sync]
        # after the first common boundary the sequences coincide
        common = set(t1) & set(t2)
        assert common
        first = min(common)
        assert [e for e in t1 if e >= first] == [e for e in t2 if e >= first]


def test_dedup_finds_subdocument_duplicates(ray_session):
    """Exact-dup docs (doc_id%25==24) share ALL chunks; near-dup docs
    (doc_id%25==12, appended tail) share their leading chunks."""
    import ray.data as rd

    from lasutility_ray.corpus.pages import pages_from_documents

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    pages = docs.map_batches(pages_from_documents, batch_format="pyarrow")
    chunks = cdc.cdc_chunks(pages, **PARAMS).to_pandas()
    dedup = cdc.cdc_dedup(pages, **PARAMS).to_pandas()
    assert dedup["n_copies"].sum() == len(chunks)
    assert (dedup["n_copies"] > 1).any()
    # keeper really is the lexicographic min of (doc_id, offset)
    merged = chunks.merge(dedup, on="chunk_hash")
    grp = merged.groupby("chunk_hash").apply(
        lambda g: (g["doc_id"].min() == g["keep_doc"].iloc[0])
        and (
            g.loc[g["doc_id"] == g["doc_id"].min(), "offset"].min()
            == g["keep_off"].iloc[0]
        ),
        include_groups=False,
    )
    assert grp.all()


def test_near_dups_share_leading_chunks(ray_session):
    """On the package's synthetic pages (documented dup injection:
    d%25==24 exact copy, d%25==12 copy + appended tail) exact-dup
    pairs share ALL chunk hashes and near-dup pairs share their
    leading chunk."""
    import ray.data as rd

    from lasutility_ray.corpus.pages import synth_pages_batch

    t = synth_pages_batch(np.arange(400, dtype=np.int64))
    pages = rd.from_arrow(t.select(["doc_id", "html"]))
    chunks = cdc.cdc_chunks(pages, **PARAMS).to_pandas()
    by_doc = chunks.sort_values(["doc_id", "chunk_idx"])
    first = by_doc.groupby("doc_id")["chunk_hash"].first()
    exact_pairs = [(d - 1, d) for d in range(400) if d % 25 == 24]
    near_pairs = [(d - 1, d) for d in range(400) if d % 25 == 12]
    for a, b in exact_pairs:
        ha = by_doc[by_doc.doc_id == a]["chunk_hash"].tolist()
        hb = by_doc[by_doc.doc_id == b]["chunk_hash"].tolist()
        assert ha == hb  # identical payload -> identical chunking
    shared = sum(first[a] == first[b] for a, b in near_pairs)
    assert shared > len(near_pairs) * 0.8


def test_determinism_across_partitionings(ray_session):
    import ray.data as rd

    from lasutility_ray.corpus.pages import pages_from_documents

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    pages = docs.map_batches(pages_from_documents, batch_format="pyarrow")
    a = (
        cdc.cdc_dedup(pages, **PARAMS)
        .to_pandas()
        .sort_values("chunk_hash")
        .reset_index(drop=True)
    )
    b = (
        cdc.cdc_dedup(pages.repartition(7), **PARAMS)
        .to_pandas()
        .sort_values("chunk_hash")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------- count-min sketch pins


def test_cms_exact_regime_and_one_sided_error(ray_session):
    """Width far above distinct-count: estimates equal exact counts.
    Narrow width: estimates are one-sided (est >= true) with the
    2N/width bound holding for the min over rows."""
    import pyarrow as pa
    import ray.data as rd

    from lasutility_ray.stages.sketch import cms_build, cms_estimate

    rng = np.random.default_rng(31)
    vals = rng.integers(0, 200, 50000).astype(np.int64)  # 200 distinct
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    true = pd.Series(vals).value_counts()
    queries = pa.array(true.index.to_numpy(np.int64), pa.int64())

    wide = cms_build(ds, "v", width=4096, depth=4)
    est = cms_estimate(wide, queries)
    assert np.array_equal(est, true.to_numpy())  # exact regime

    narrow = cms_build(ds, "v", width=64, depth=4)
    est_n = cms_estimate(narrow, queries)
    assert np.all(est_n >= true.to_numpy())  # one-sided
    assert np.all(est_n <= true.to_numpy() + 2 * len(vals) / 64 * 4)
    # total mass per row is exact in both regimes
    assert np.all(narrow.sum(axis=1) == len(vals))


def test_cms_partitioning_independence(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from lasutility_ray.stages.sketch import cms_build

    rng = np.random.default_rng(37)
    vals = rng.integers(0, 5000, 30000).astype(np.int64)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    a = cms_build(rd.from_arrow(t), "v", width=256, depth=3)
    b = cms_build(rd.from_arrow(t).repartition(13), "v", width=256, depth=3)
    assert np.array_equal(a, b)


def test_hll_group_distinct(ray_session):
    """Per-group HLL: within standard error of exact per-group
    distinct counts, exactly partitioning-independent, and the wire
    only ever carries register blobs."""
    import pyarrow as pa
    import ray.data as rd

    from lasutility_ray.stages.sketch import hll_group_distinct

    rng = np.random.default_rng(41)
    n = 60000
    g = rng.integers(0, 8, n)
    # distinct universe size differs strongly per group
    v = rng.integers(0, 50 * (1 + g * 10), n) + g * 10_000_000
    t = pa.table({"g": pa.array(g, pa.int64()), "v": pa.array(v, pa.int64())})
    out = (
        hll_group_distinct(rd.from_arrow(t), "g", "v", p=10)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    true = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].nunique()
    assert len(out) == 8
    rel = np.abs(out["estimate"].to_numpy() - true.to_numpy()) / true.to_numpy()
    assert rel.max() < 0.15  # ~3 sigma at p=10 (sigma ~ 3.25%)
    # partitioning independence (bit-exact estimates)
    out2 = (
        hll_group_distinct(rd.from_arrow(t).repartition(9), "g", "v", p=10)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
