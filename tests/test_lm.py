"""Unigram-LM familiarity scoring: model math vs a pure-python
oracle, OOV handling, and value-exactness vs DuckDB on testdata."""

import math

import duckdb
import pandas as pd

import ray.data as rd

from lasutility_ray.stages.lm import (
    train_unigram,
    unigram_lm_score,
    unigram_lm_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _mk_ds(texts):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_train_and_score_tiny(ray_session):
    # corpus: a a a b b c  -> total 6; vocab cap 2 keeps {a, b}; c is OOV
    ds = _mk_ds(["a a a b", "b c"])
    vocab, oov, total = train_unigram(ds, max_vocab=2)
    assert total == 6
    assert vocab["token"].tolist() == ["a", "b"]
    mb_a = math.floor(-1000 * math.log(3 / 6))
    mb_b = math.floor(-1000 * math.log(2 / 6))
    assert vocab["millibits"].tolist() == [mb_a, mb_b]
    assert oov == math.floor(-1000 * math.log(1 / 6))

    out = (
        unigram_lm_score(ds, max_vocab=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [4, 2]
    assert out["n_oov"].tolist() == [0, 1]
    assert out["score_millibits"].tolist() == [3 * mb_a + mb_b, mb_b + oov]


def test_zero_token_docs_dropped(ray_session):
    out = unigram_lm_score(_mk_ds(["hello world", "   ", "!!!"])).to_pandas()
    assert out["doc_id"].tolist() == [0]


def test_value_exact_vs_duckdb(ray_session):
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    got = (
        unigram_lm_score(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    ref = con.execute(unigram_lm_sql()).df().sort_values("doc_id").reset_index(drop=True)
    assert got["n_oov"].sum() > 0  # the OOV path is actually exercised
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], ref[sorted(ref.columns)], check_dtype=False
    )


def test_all_empty_corpus(ray_session):
    ds = _mk_ds(["", "   ", "!!!"])
    out = unigram_lm_score(ds).to_pandas()
    assert len(out) == 0


# ------------------------------------------------------- bigram LM


def test_bigram_tiny_brute_force(ray_session):
    """Hand corpus vs a direct transcription of the interpolated
    recurrence, OOV bucket exercised (vocab cap 2 -> 'c' is OOV)."""
    import numpy as np

    from lasutility_ray.stages.lm import bigram_lm_score, train_bigram

    ds = _mk_ds(["a a b c", "b a", "c"])
    tokens, mb, btot = train_bigram(ds, max_vocab=2)
    # mapped streams: [a a b OOV], [b a], [OOV] (dropped: 1 token)
    # pairs: (a,a) (a,b) (b,OOV) | (b,a)  -> btot = 4
    assert btot == 4
    k = len(tokens)
    assert k == 2 and list(tokens) == ["a", "b"]
    ai, bi, oov = 0, 1, 2
    cab = {(ai, ai): 1, (ai, bi): 1, (bi, oov): 1, (bi, ai): 1}
    ca = {ai: 2, bi: 2}
    cb = {ai: 2, bi: 1, oov: 1}
    for (x, y), c in cab.items():
        p = 0.7 * (c / ca[x]) + 0.3 * (cb[y] / 4.0)
        assert mb[x, y] == int(np.floor(-1000.0 * math.log(p)))
    got = bigram_lm_score(ds, max_vocab=2).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [0, 1]  # 1-token doc dropped
    assert got["n_pairs"].tolist() == [3, 1]
    s0 = int(mb[ai, ai] + mb[ai, bi] + mb[bi, oov])
    s1 = int(mb[bi, ai])
    assert got["score_millibits"].tolist() == [s0, s1]


def test_bigram_value_exact_vs_duckdb(ray_session):
    from lasutility_ray.stages.lm import bigram_lm_score, bigram_lm_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    got = bigram_lm_score(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref = con.execute(bigram_lm_sql()).df().sort_values("doc_id").reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], ref[sorted(ref.columns)])


def test_bigram_predictable_text_scores_lower(ray_session):
    """A repetitive (highly predictable) doc must score fewer
    millibits per pair than a shuffled-vocabulary doc."""
    from lasutility_ray.stages.lm import bigram_lm_score

    texts = ["a b a b a b a b a b"] * 5 + ["b b a a b a b b a a"]
    ds = _mk_ds(texts)
    got = bigram_lm_score(ds, max_vocab=4).to_pandas()
    per_pair = got["score_millibits"] / got["n_pairs"]
    assert per_pair.iloc[0] < per_pair.iloc[-1]
