"""Benchmark-contamination stage (stages/contamination.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from lasutility_ray.stages.contamination import eval_gram_set, ngram_contamination

SF = "/root/testdata/sf0.001"


def test_contamination_semantics(ray_session):
    eval_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100], pa.int64()),
                "text": pa.array(["the quick brown fox jumps"], pa.string()),
            }
        )
    )
    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        # contains "the quick brown" (the eval 3-gram)
                        "so the quick brown fox ran away",
                        # tokens overlap but no shared 3-gram
                        "brown the quick",
                        # too short for any 3-gram
                        "hi there",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = (
        ngram_contamination(train, eval_ds, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_grams"].tolist() == [5, 1, 0]
    # doc 1 shares 3 eval 3-grams: "the quick brown", "quick brown fox",
    # "brown fox ran"? no — eval grams are from "the quick brown fox jumps":
    # {the quick brown, quick brown fox, brown fox jumps}; doc 1 has
    # "the quick brown" and "quick brown fox" -> 2 hits
    assert out["n_contaminated"].tolist() == [2, 0, 0]
    assert out["is_contaminated"].tolist() == [True, False, False]


def test_eval_gram_set_distinct(ray_session):
    eval_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a b c", "a b c"], pa.string()),
            }
        )
    )
    g = eval_gram_set(eval_ds, n=2)
    assert sorted(g.tolist()) == ["a b", "b c"]


def test_contamination_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    df = entry.queries()["q_contamination"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_contamination"]).df()
    cols = sorted(df.columns)
    a = df[cols].sort_values("doc_id").reset_index(drop=True)
    b = ref[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=True)
    assert len(a) > 0


def test_corpus_curation_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    df = entry.queries()["q_corpus_curation"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_corpus_curation"]).df()
    cols = sorted(df.columns)
    a = df[cols].sort_values("doc_id").reset_index(drop=True)
    b = ref[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=True)
    # the pipeline must actually filter (not pass everything through)
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(a) < n_docs
