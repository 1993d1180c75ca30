"""Session-5 second batch: pivot, IQR filter, distributed PCA
(relational.pivot_counts, quantiles.iqr_filter, stages/pca.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _oracle_con(tables=("documents",)):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _sorted(df, cols=None):
    cols = cols or sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


# ------------------------------------------------------------------ pivot


def test_pivot_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con()
    df = entry.queries()["q_pivot_lang_source"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_pivot_lang_source"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)


def test_pivot_unknown_category_buckets_to_other(ray_session):
    from lasutility_ray.stages.relational import pivot_counts

    t = pa.table(
        {
            "source": pa.array(["a", "a", "b", "b", "b"]),
            "lang": pa.array(["en", "xx", "en", "de", "yy"]),
        }
    )
    out = (
        pivot_counts(rd.from_arrow(t), "source", "lang", ["en", "de"])
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["a", "n_en"] == 1 and out.loc["a", "n_other"] == 1
    assert out.loc["b", "n_en"] == 1 and out.loc["b", "n_de"] == 1
    assert out.loc["b", "n_other"] == 1
    assert out.loc["a", "n_de"] == 0


# ------------------------------------------------------------------ iqr


def test_iqr_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con()
    df = entry.queries()["q_iqr_filter"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_iqr_filter"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    # both branches must fire on the fixture at k=0.25
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(df) < n_docs


def test_iqr_trims_planted_outliers(ray_session):
    from lasutility_ray.stages.quantiles import iqr_filter

    vals = [10, 11, 12, 13, 14, 15, 16, 17, 1000, -900]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(vals)), pa.int64()),
            "lang": pa.array(["en"] * len(vals)),
            "n_chars": pa.array(vals, pa.int64()),
        }
    )
    out = iqr_filter(
        rd.from_arrow(t), "lang", "n_chars", passthrough=["doc_id"]
    ).to_pandas()
    assert sorted(out["doc_id"].tolist()) == list(range(8))  # outliers dropped


# ------------------------------------------------------------------ pca


def _ref_pca(x: np.ndarray, k: int = 2):
    from lasutility_ray.stages.pca import Q

    qx = np.rint(x * Q).astype(np.int64)
    n = qx.shape[0]
    mean_q = qx.sum(axis=0).astype(np.float64) / n
    cov = (
        (qx.T.astype(np.float64) @ qx.astype(np.float64)) / n
        - np.outer(mean_q, mean_q)
    ) / (Q * Q)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    flips = np.sign(comps[np.argmax(np.abs(comps), axis=0), np.arange(k)])
    flips[flips == 0] = 1.0
    comps = comps * flips
    return np.round((x - mean_q / Q) @ comps, 9)


def test_pca_matches_single_process_reference(ray_session):
    import pyarrow.parquet as pq

    from lasutility_ray.stages.pca import _embed_matrix, pca_project

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    proj = pca_project(emb, k=2).to_pandas().sort_values("vec_id")
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ref = _ref_pca(_embed_matrix(t, "embedding"), k=2)
    order = np.argsort(t["vec_id"].to_numpy())
    assert np.allclose(proj[["pc1", "pc2"]].to_numpy(), ref[order], atol=1e-9)
    # axiom: components ordered by explained variance
    assert proj["pc1"].var() >= proj["pc2"].var()


def test_pca_partition_invariant(ray_session):
    """Integer moment partials make the fit bit-identical for any
    partitioning of the same rows."""
    from lasutility_ray.stages.pca import pca_project

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    a = pca_project(emb, k=2).to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = (
        pca_project(emb.repartition(17), k=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pca_recovers_planted_axis(ray_session):
    """Data generated along one dominant axis: pc1 must align with it
    (|cosine| ~ 1) and carry almost all the variance."""
    from lasutility_ray.stages.pca import fit_pca

    rng = np.random.RandomState(3)
    d, n = 16, 400
    axis = rng.randn(d)
    axis /= np.linalg.norm(axis)
    x = np.outer(rng.randn(n) * 5.0, axis) + rng.randn(n, d) * 0.01
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(x.astype(np.float32)), pa.list_(pa.float32())),
        }
    )
    mean, comps, var = fit_pca(rd.from_arrow(t), k=2)
    assert abs(float(comps[:, 0] @ axis)) > 0.999
    assert var[0] > 100 * var[1]


# --------------------------------------------------------- composition


def test_gopher_budget_curate_matches_duckdb(ray_session):
    """The composed curation (quality gate -> budget selection) is
    value-exact against ONE SQL query, not just stage-by-stage."""
    import __ray_entry__ as entry

    con = _oracle_con()
    df = entry.queries()["q_gopher_budget_curate"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_gopher_budget_curate"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    assert 0 < df["selected"].sum() < len(df)


# --------------------------------------------------------------- phash


def test_image_phash_recovers_planted_near_dups(ray_session):
    """The q_image_phash harness plants lossy-JPEG near-dups (exact
    pixel hashing cannot find them); the pHash band shuffle must
    recover EXACTLY the planted pairs."""
    import __ray_entry__ as entry
    import pyarrow.parquet as pq

    pairs = entry.queries()["q_image_phash"](SF).to_pandas()
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    idset = set(ids.tolist())
    planted = {(d - 1, d) for d in idset if d % 10 == 9 and (d - 1) in idset}
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert got == planted
    assert (pairs["hamming"] <= 5).all()


def test_phash_container_and_jpeg_invariance(ray_session):
    """Same pixels in GRD1 vs PNG -> identical pHash (hamming 0);
    lossy JPEG of the same image -> small hamming; distinct blob
    images -> large hamming."""
    import numpy as np

    from lasutility_ray.geom.jpeg import encode_jpeg
    from lasutility_ray.geom.png import encode_grey_png
    from lasutility_ray.stages.multimodal import (
        HEADER,
        PHash,
        synth_blob_image_bytes,
    )

    ph = PHash()
    raw = synth_blob_image_bytes(np.array([42]))[0]
    img = np.frombuffer(raw, np.uint8, offset=HEADER.size).reshape(64, 64)
    h_raw = ph._hash_one(raw)
    h_png = ph._hash_one(encode_grey_png(img, top_down=False))
    h_jpg = ph._hash_one(encode_jpeg(img, quality=85))
    other = ph._hash_one(synth_blob_image_bytes(np.array([7]))[0])
    assert h_raw == h_png
    assert bin(h_raw ^ h_jpg).count("1") <= 5
    assert bin(h_raw ^ other).count("1") >= 8


# --------------------------------------------------------- spectrogram


def test_audio_spectrogram_matches_numpy_reference(ray_session):
    """The actor-pool stage must equal the direct numpy pipeline on
    the same decoded PCM."""
    import numpy as np

    import __ray_entry__ as entry
    from lasutility_ray.stages.multimodal import (
        decode_audio,
        log_mel_spectrogram,
        synth_audio_bytes,
    )

    out = (
        entry.queries()["q_audio_spectrogram"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pyarrow.parquet as pq

    ids = np.sort(
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
    )
    for i in (0, len(ids) // 2, len(ids) - 1):
        data = synth_audio_bytes(np.array([ids[i]]))[0]
        sr, pcm = decode_audio(data)
        ref = log_mel_spectrogram(pcm, sr)
        row = out.iloc[i]
        assert row["n_frames"] == ref.shape[0]
        assert np.allclose(
            np.array(row["mel_means"]), np.round(ref.mean(axis=0), 9), atol=1e-9
        )


def test_spectrogram_container_invariance(ray_session):
    """The same PCM through the raw fake header and through a real
    RIFF/WAV container yields the identical spectrogram."""
    import numpy as np

    from lasutility_ray.stages.multimodal import (
        decode_audio,
        log_mel_spectrogram,
        synth_audio_bytes,
    )

    raw = synth_audio_bytes(np.array([11]))[0]
    sr, pcm = decode_audio(raw)
    # hand-build a minimal PCM16 mono WAV around the same samples
    import struct

    body = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    sr2, pcm2 = decode_audio(wav)
    assert sr2 == sr and np.array_equal(pcm, pcm2)
    assert np.array_equal(log_mel_spectrogram(pcm, sr), log_mel_spectrogram(pcm2, sr2))


def test_mel_filterbank_axioms(ray_session):
    """Filterbank rows are non-negative, each covers a contiguous
    band, and band center frequencies increase."""
    import numpy as np

    from lasutility_ray.stages.multimodal import SPEC_NFFT, SPEC_NMELS, _mel_filterbank

    fb = _mel_filterbank(8000, SPEC_NFFT, SPEC_NMELS)
    assert fb.shape == (SPEC_NMELS, SPEC_NFFT // 2 + 1)
    assert (fb >= 0).all() and fb.sum(axis=1).min() > 0
    centers = [np.argmax(fb[m]) for m in range(SPEC_NMELS)]
    assert all(c2 >= c1 for c1, c2 in zip(centers, centers[1:]))
