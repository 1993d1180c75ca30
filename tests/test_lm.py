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
