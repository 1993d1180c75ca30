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


def test_bloom_superset_of_exact(ray_session):
    """Bloom screen must flag every exactly-contaminated doc (zero
    false negatives) at any eval-set size."""
    import ray.data as rd

    from lasutility_ray.stages.contamination import (
        bloom_contamination,
        ngram_contamination,
    )

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    ev = docs.filter(lambda r: r["doc_id"] % 10 == 0)
    exact = (
        ngram_contamination(docs, ev, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bloom = (
        bloom_contamination(docs, ev, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (exact["n_grams"] == bloom["n_grams"]).all()
    # superset: every exact hit is a bloom hit, counts >= exact counts
    assert (bloom["n_bloom_hits"] >= exact["n_contaminated"]).all()
    assert bool((exact["is_contaminated"] & ~bloom["maybe_contaminated"]).any()) is False
    # and at 1 MiB / ~30k grams the FP rate is negligible: flags equal
    assert (bloom["maybe_contaminated"] == exact["is_contaminated"]).all()


def test_bloom_fp_rate_bounded(ray_session):
    """Tiny bitmap forced: FPs appear but stay near the analytic rate."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lasutility_ray.stages.contamination import bloom_contamination

    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(500), pa.int64()),
                "text": pa.array(
                    [" ".join(f"t{i}w{j}" for j in range(12)) for i in range(500)],
                    pa.string(),
                ),
            }
        )
    )
    ev = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array([" ".join(f"e{j}" for j in range(40))], pa.string()),
            }
        )
    )
    # disjoint vocabularies: every hit is a false positive
    out = bloom_contamination(train, ev, n=8, m=1 << 10, k=2).to_pandas()
    n_grams = out["n_grams"].sum()
    fp = out["n_bloom_hits"].sum()
    # k=2, m=1024, 33 eval grams -> p ~ (1-exp(-66/1024))^2 ~ 0.004
    assert fp / n_grams < 0.05
    big = bloom_contamination(train, ev, n=8).to_pandas()
    assert not big["maybe_contaminated"].any()
