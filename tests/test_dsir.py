"""DSIR importance weighting (stages/dsir.py): model math vs a
pure-python oracle, target-likeness semantics, partitioning
invariance, and value-exactness vs DuckDB on testdata."""

import hashlib
import math
import re

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from lasutility_ray.stages.dsir import (
    N_BUCKETS,
    dsir_select,
    dsir_select_sql,
    dsir_weights,
    dsir_weights_sql,
    train_dsir,
)

SF_DIR = "/root/testdata/sf0.001"


def _mk_ds(texts, langs, parallelism=None):
    df = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts, "lang": langs}
    )
    ds = rd.from_pandas(df)
    if parallelism:
        ds = ds.repartition(parallelism)
    return ds


def _oracle_weights(texts, langs, target="en"):
    """Single-process reference implementation of train+score."""
    pat = re.compile(r"[a-z0-9]+")

    def feats(s):
        t = pat.findall(s.lower())
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:2], 16)

    cr = np.zeros(N_BUCKETS, np.int64)
    ct = np.zeros(N_BUCKETS, np.int64)
    for s, lang in zip(texts, langs):
        for f in feats(s):
            b = bucket(f)
            cr[b] += 1
            if lang == target:
                ct[b] += 1
    tr, tt = int(cr.sum()), int(ct.sum())
    mb = np.zeros(N_BUCKETS, np.int64)
    for b in range(N_BUCKETS):
        if cr[b]:
            mb[b] = math.floor(
                1000.0
                * math.log(
                    ((ct[b] + 1) * (tr + N_BUCKETS))
                    / ((cr[b] + 1) * (tt + N_BUCKETS))
                )
            )
    rows = []
    for i, s in enumerate(texts):
        fs = feats(s)
        if fs:
            rows.append(
                (i, len(fs), int(sum(mb[bucket(f)] for f in fs)))
            )
    return mb, pd.DataFrame(
        rows, columns=["doc_id", "n_feats", "logw_millibits"]
    )


def test_train_matches_oracle_tiny(ray_session):
    texts = ["the cat sat", "die katze sass", "the dog sat", ""]
    langs = ["en", "de", "en", "de"]
    mb = train_dsir(_mk_ds(texts, langs))
    mb_ref, _ = _oracle_weights(texts, langs)
    assert np.array_equal(mb, mb_ref)


def test_scores_match_oracle_and_drop_empty(ray_session):
    texts = ["the cat sat", "die katze sass", "the dog sat", "", "cat"]
    langs = ["en", "de", "en", "de", "de"]
    got = (
        dsir_weights(_mk_ds(texts, langs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _, exp = _oracle_weights(texts, langs)
    pd.testing.assert_frame_equal(got, exp.astype("int64"))
    assert 3 not in got["doc_id"].tolist()  # empty doc dropped


def test_target_like_docs_score_higher(ray_session):
    # docs sharing vocabulary with the english target slice must
    # out-weigh docs sharing vocabulary with the non-target slice
    texts = (
        ["quick brown fox jumps over"] * 4
        + ["schnelle braune katze springt"] * 4
        + ["quick brown fox", "schnelle braune katze"]
    )
    langs = ["en"] * 4 + ["de"] * 4 + ["de", "de"]
    got = dsir_weights(_mk_ds(texts, langs)).to_pandas()
    w = dict(zip(got["doc_id"], got["logw_millibits"]))
    assert w[8] > w[9]  # english-looking probe beats german-looking


def test_partitioning_invariance(ray_session):
    texts = [f"tok{i} common word {'x' * (i % 3 + 1)}" for i in range(40)]
    langs = ["en" if i % 3 == 0 else "de" for i in range(40)]
    a = (
        dsir_weights(_mk_ds(texts, langs, parallelism=1))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dsir_weights(_mk_ds(texts, langs, parallelism=7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_value_exact_vs_duckdb_on_testdata(ray_session):
    ds = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    got = (
        dsir_weights(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    exp = (
        con.execute(dsir_weights_sql())
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)

    sel = (
        dsir_select(ds, 20)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sel_exp = (
        con.execute(dsir_select_sql(20))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        sel[sorted(sel.columns)], sel_exp[sorted(sel_exp.columns)]
    )
    # selection must be target-enriched vs the corpus base rate
    lang = con.execute(
        "SELECT doc_id, lang FROM documents"
    ).fetchdf()
    merged = sel.merge(lang, on="doc_id")
    base = (lang["lang"] == "en").mean()
    assert (merged["lang"] == "en").mean() > base
