"""BM25 scoring (stages/bm25.py): SQL-oracle exactness, brute-force
formula pin on a hand corpus, and monotonicity axioms."""

import duckdb
import math

import numpy as np
import pandas as pd
import pyarrow as pa

from lasutility_ray.stages import bm25

SF = "/root/testdata/sf0.001"


def test_matches_oracle(ray_session):
    import ray.data as rd

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = bm25.bm25_scores(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref = con.execute(bm25.bm25_sql()).df().sort_values("doc_id").reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], ref[sorted(ref.columns)])


def test_hand_corpus_brute_force(ray_session):
    import ray.data as rd

    texts = [
        "apple banana apple cherry",  # tf(apple)=2
        "apple",  # short doc, tf=1
        "banana cherry cherry cherry",  # no apple
        "date elderberry fig grape honeydew kiwi lemon",  # no hits
        "apple apple apple apple apple apple",  # heavy tf, saturation
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    )
    terms = ("apple", "banana")
    got = (
        bm25.bm25_scores(ds, terms=terms)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute-force transcription of Okapi BM25 with the same quantizer
    dls = [4, 1, 4, 7, 6]
    n, tot = 5, sum(dls)
    avgdl = tot / n
    dfs = {"apple": 3, "banana": 2}
    rows = []
    for i, t in enumerate(texts):
        ws = t.split()
        score, hits = 0, 0
        for term in terms:
            tf = ws.count(term)
            if tf == 0:
                continue
            hits += 1
            idf = math.log((n - dfs[term] + 0.5) / (dfs[term] + 0.5) + 1.0)
            tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[i] / avgdl))
            score += int(np.floor(1000000.0 * idf * tfn))
        if hits:
            rows.append({"doc_id": i, "n_hit_terms": hits, "score_micro": score})
    want = pd.DataFrame(rows).astype({"doc_id": np.int64, "n_hit_terms": np.int64,
                                      "score_micro": np.int64})
    pd.testing.assert_frame_equal(got, want)
    # axioms: more tf -> higher score (docs 1 vs 4 for 'apple' — but
    # different dl; compare 0 vs 1 explicitly: tf 2 @ dl4 > tf 1 @ dl1
    # is not guaranteed; instead check saturation: score(doc4) is
    # bounded by the (k1+1)*idf ceiling
    apple_idf = math.log((5 - 3 + 0.5) / (3 + 0.5) + 1.0)
    assert got.loc[got.doc_id == 4, "score_micro"].iloc[0] < 2.2 * apple_idf * 1e6


def test_rare_term_outscores_common_term(ray_session):
    """idf ordering: a doc matching only a rare term beats a doc of
    the same length matching only a common term."""
    import ray.data as rd

    texts = ["rare filler filler", "common filler filler"] + ["common pad pad"] * 8
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(10), pa.int64()), "text": texts})
    )
    got = bm25.bm25_scores(ds, terms=("rare", "common")).to_pandas()
    s_rare = got.loc[got.doc_id == 0, "score_micro"].iloc[0]
    s_common = got.loc[got.doc_id == 1, "score_micro"].iloc[0]
    assert s_rare > s_common
