"""Chunking + vocabulary stages (stages/chunking.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from lasutility_ray.stages.chunking import chunk_documents, distinctive_terms, token_topk

SF = "/root/testdata/sf0.001"


def test_chunk_edges(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["abcdefghij", "abc", "", "abcd"], pa.string()),
            }
        )
    )
    out = (
        chunk_documents(docs, size=4, overlap=1)  # stride 3
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    # doc 1 (10 chars, stride 3): starts 0,3,6,9 -> abcd, defg, ghij, j
    d1 = out[out.doc_id == 1]
    assert d1.chunk_text.tolist() == ["abcd", "defg", "ghij", "j"]
    assert d1.chunk_idx.tolist() == [0, 1, 2, 3]
    assert d1.chunk_chars.tolist() == [4, 4, 4, 1]
    # doc 2 (3 chars): one short chunk; doc 3 empty: none; doc 4: exactly size
    assert out[out.doc_id == 2].chunk_text.tolist() == ["abc"]
    assert (out.doc_id != 3).all()
    assert out[out.doc_id == 4].chunk_text.tolist() == ["abcd", "d"]


def test_chunk_bad_params_raise(ray_session):
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["x"])})
    )
    with pytest.raises(ValueError):
        chunk_documents(docs, size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, size=5, overlap=5)


def test_chunk_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    df = entry.queries()["q_chunk_documents"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_chunk_documents"]).df()
    cols = sorted(df.columns)
    a = df[cols].sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    b = ref[cols].sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=True)
    assert len(a) > 0


def test_token_topk_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    df = entry.queries()["q_token_topk"](SF)
    ref = con.execute(entry.oracle_sql()["q_token_topk"]).df()
    a = df.sort_values("rank").reset_index(drop=True)[sorted(df.columns)]
    b = ref.sort_values("rank").reset_index(drop=True)[sorted(ref.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=True)
    assert 0 < len(a) <= 50  # sf0.001's synthetic vocab is < 50 tokens


def test_distinctive_terms_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    df = entry.queries()["q_distinctive_terms"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_distinctive_terms"]).df()
    cols = sorted(df.columns)
    a = df[cols].sort_values(["doc_id", "rank"]).reset_index(drop=True)
    b = ref[cols].sort_values(["doc_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=True)
    assert len(a) > 0


def test_distinctive_terms_ranking_rule(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "rare rare common",   # tf(rare)=2 beats tf(common)=1
                        "common solo",        # tie tf=1 -> rarer df first
                        "common",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = (
        distinctive_terms(docs, k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    assert d1.token.tolist() == ["rare", "common"]  # tf 2 > tf 1
    d2 = out[out.doc_id == 2]
    # both tf=1; df(solo)=1 < df(common)=3 -> solo ranks first
    assert d2.token.tolist() == ["solo", "common"]
    assert d2.df.tolist() == [1, 3]


# ---------------------------------------------------------- inverted index


def test_inverted_index_matches_bruteforce(ray_session):
    import re

    from lasutility_ray.stages.chunking import TOKEN_RE, inverted_index

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = inverted_index(docs).to_pandas().sort_values("token").reset_index(drop=True)
    pdf = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    pat = re.compile(TOKEN_RE)
    ref = {}
    for did, txt in zip(pdf.doc_id, pdf.text):
        for tok in set(pat.findall(txt.lower())):
            ref.setdefault(tok, []).append(int(did))
    assert sorted(ref) == out.token.tolist()
    for _, r in out.iterrows():
        assert list(r.postings) == sorted(ref[r.token])
        assert r.df == len(ref[r.token])


def test_inverted_index_min_df_and_cap(ray_session):
    from lasutility_ray.stages.chunking import inverted_index

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    full = inverted_index(docs).to_pandas()
    kept = inverted_index(docs, min_df=3).to_pandas()
    assert set(kept.token) == set(full[full.df >= 3].token)
    capped = inverted_index(docs, min_df=3, max_postings=2).to_pandas()
    m = capped.set_index("token")
    for _, r in kept.iterrows():
        assert list(m.loc[r.token].postings) == list(r.postings)[:2]
        assert m.loc[r.token].df == r.df  # df stays exact under the cap


def test_inverted_index_partitioning_invariant(ray_session):
    from lasutility_ray.stages.chunking import inverted_index

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = inverted_index(docs.repartition(1), min_df=2).to_pandas()
    b = inverted_index(docs.repartition(9), min_df=2).to_pandas()
    a = a.sort_values("token").reset_index(drop=True)
    b = b.sort_values("token").reset_index(drop=True)
    assert a.token.tolist() == b.token.tolist()
    assert a.df.tolist() == b.df.tolist()
    for x, y in zip(a.postings, b.postings):
        assert list(x) == list(y)
