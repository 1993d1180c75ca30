"""Quality-classifier family: distributed LR training (exact integer
gradient accumulation), broadcast-weight scoring, SQL mirror, and the
planted-model recovery guarantee."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from lasutility_ray.stages.classifier import (
    DEFAULT_QUALITY_BIAS,
    DEFAULT_QUALITY_WEIGHTS,
    FEATURE_OFFSET,
    FEATURE_SCALE,
    FEATURES,
    MICRO,
    featurize_documents,
    planted_label,
    score_quality,
    score_quality_sql,
    train_quality_logreg,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def feats(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return featurize_documents(docs).materialize()


def _local_reference_train(df, iters=80, lr=2.0):
    """Single-process reimplementation with the SAME integer
    quantization — the distributed trainer must match it exactly."""
    y = planted_label(df).astype(np.float64)
    x = np.stack(
        [
            (df[c].to_numpy(np.float64) - FEATURE_OFFSET[c]) / FEATURE_SCALE[c]
            for c in FEATURES
        ],
        axis=1,
    )
    w = np.zeros(len(FEATURES))
    b = 0.0
    n = len(df)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        err = p - y
        g = np.array(
            [np.rint(err * x[:, j] * MICRO).astype(np.int64).sum() for j in
             range(len(FEATURES))],
            np.float64,
        ) / (MICRO * n)
        gb = np.rint(err * MICRO).astype(np.int64).sum() / (MICRO * n)
        w -= lr * g
        b -= lr * gb
    w_micro = [
        int(np.rint(w[j] / FEATURE_SCALE[c] * MICRO))
        for j, c in enumerate(FEATURES)
    ]
    b_fold = b - sum(
        w[j] * FEATURE_OFFSET[c] / FEATURE_SCALE[c] for j, c in enumerate(FEATURES)
    )
    return w_micro, int(np.rint(b_fold * MICRO))


def test_training_matches_local_reference_exactly(feats):
    """Integer gradient quantization per document makes distributed
    full-batch GD bit-identical to the single-process reference —
    regardless of batching/partitioning."""
    w, b, hist = train_quality_logreg(feats)
    w_ref, b_ref = _local_reference_train(feats.to_pandas())
    assert w == w_ref
    assert b == b_ref
    assert hist[0]["loss_micro"] == 693147  # ln(2) micro-nats at w=0


def test_training_is_partitioning_invariant(feats):
    """Same data, different block structure -> identical weights."""
    w1, b1, _ = train_quality_logreg(feats, iters=10)
    w2, b2, _ = train_quality_logreg(feats.repartition(7), iters=10)
    assert w1 == w2 and b1 == b2


def test_default_weights_match_training(feats):
    w, b, _ = train_quality_logreg(feats)
    assert dict(zip(FEATURES, w)) == DEFAULT_QUALITY_WEIGHTS
    assert b == DEFAULT_QUALITY_BIAS


def test_planted_model_is_recovered(feats):
    """Accuracy reaches the noiseless-rule ceiling, far above the
    base rate — the trainer actually learns."""
    df = feats.to_pandas()
    y = planted_label(df)
    sc = score_quality(feats).to_pandas()
    m = sc.merge(pd.DataFrame({"doc_id": df.doc_id, "y": y}), on="doc_id")
    acc = ((m.predicted == 1) == (m.y == 1)).mean()
    base = max(y.mean(), 1 - y.mean())
    assert acc >= 0.85
    assert acc > base + 0.15


def test_score_matches_sql_oracle_value_exact(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ours = (
        score_quality(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ref = (
        con.execute(score_quality_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        ours[["doc_id", "margin_micro", "predicted"]],
        ref[["doc_id", "margin_micro", "predicted"]],
        check_dtype=False,
    )


def test_score_accepts_prefeaturized_table(feats):
    a = score_quality(feats).to_pandas().sort_values("doc_id")
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    b = score_quality(docs).to_pandas().sort_values("doc_id")
    assert a.margin_micro.tolist() == b.margin_micro.tolist()


# ------------------------------------------------------------- AUC


def _auc_reference(scores, labels):
    """Brute-force pair-counting AUC (half-credit ties), doubled."""
    s = np.asarray(scores)
    y = np.asarray(labels)
    pos, neg = s[y == 1], s[y == 0]
    num = 0
    for p in pos:
        num += 2 * int((p > neg).sum()) + int((p == neg).sum())
    return num, 2 * len(pos) * len(neg)


def test_auc_matches_bruteforce_pairs(ray_session):
    from lasutility_ray.stages.classifier import auc_score

    rng = np.random.default_rng(7)
    n = 400
    scores = rng.integers(-20, 20, n)  # heavy ties on purpose
    labels = (scores + rng.integers(-15, 15, n) > 0).astype(np.int64)
    df = pd.DataFrame({"margin_micro": scores, "label": labels})
    out = auc_score(rd.from_pandas(df).repartition(7))
    num, den = _auc_reference(scores, labels)
    assert out.auc_num_x2.iloc[0] == num
    assert out.auc_den_x2.iloc[0] == den
    assert out.auc_milli.iloc[0] == 1000 * num // den


def test_auc_partitioning_invariant(ray_session):
    from lasutility_ray.stages.classifier import auc_score

    rng = np.random.default_rng(8)
    df = pd.DataFrame(
        {
            "margin_micro": rng.integers(-5, 5, 300),
            "label": rng.integers(0, 2, 300),
        }
    )
    outs = [
        auc_score(rd.from_pandas(df).repartition(k)).to_dict("records")[0]
        for k in (1, 3, 11)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_auc_degenerate_single_class(ray_session):
    from lasutility_ray.stages.classifier import auc_score

    df = pd.DataFrame({"margin_micro": [1, 2, 3], "label": [1, 1, 1]})
    out = auc_score(rd.from_pandas(df))
    assert out.auc_den_x2.iloc[0] == 0
    assert out.auc_milli.iloc[0] == -1


def test_quality_auc_sql_mirror_value_exact(ray_session):
    """Composed featurize -> score -> planted label -> AUC matches the
    single DuckDB window-function query exactly."""
    from lasutility_ray.stages.classifier import (
        DEFAULT_QUALITY_BIAS,
        DEFAULT_QUALITY_WEIGHTS,
        auc_score,
        featurize_documents,
        quality_auc_sql,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    items = sorted(DEFAULT_QUALITY_WEIGHTS.items())

    def score_and_label(df):
        margin = np.full(len(df), DEFAULT_QUALITY_BIAS, np.int64)
        for c, wc in items:
            margin += wc * df[c].to_numpy(np.int64)
        return pd.DataFrame({"margin_micro": margin, "label": planted_label(df)})

    ours = auc_score(
        featurize_documents(docs).map_batches(score_and_label, batch_format="pandas")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ref = con.execute(quality_auc_sql()).df()
    assert ours.astype("int64").to_dict("records") == ref.astype("int64").to_dict(
        "records"
    )
