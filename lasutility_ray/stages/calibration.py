"""Classifier calibration (reliability) table — the model-eval
companion to stages/classifier.py: bucket the published quality
model's integer margin into fixed-width bins and report, per bin, the
observed positive rate of the planted label. The reliability curve a
curation team reads before trusting classifier-thresholded filtering
(q_quality_score's margins are only as good as their calibration).

Fixed-width margin bins (floor division, negative-safe) rather than
data-dependent deciles: a pure map + key-space-bounded groupby — no
rank shuffle — and the same expression mirrors in SQL. Counts and the
``pos_rate_micro = floor(1e6 * n_pos / n)`` ratio are integers, so
the table is value-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BIN_MICRO = 2_000_000  # margin-space bin width
# DuckDB's // TRUNCATES toward zero while numpy floor-divides, so the
# engines disagree on negative margins ((-7)//2 = -3 vs -4). Shifting
# by a bin-width multiple keeps every dividend positive in both;
# subtracting the shifted bin count restores the true floor bin.
_OFF_BINS = 1 << 32


def calibration_bins(docs_ds, bin_micro: int = BIN_MICRO):
    """documents -> (bin_id, n, n_pos, pos_rate_micro) per occupied
    fixed-width margin bin of the published quality classifier."""
    from ray.data.aggregate import Sum

    from .classifier import (
        DEFAULT_QUALITY_BIAS,
        DEFAULT_QUALITY_WEIGHTS,
        featurize_documents,
        planted_label,
    )

    items = sorted(DEFAULT_QUALITY_WEIGHTS.items())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        margin = np.full(len(df), DEFAULT_QUALITY_BIAS, np.int64)
        for col, w in items:
            margin += w * df[col].to_numpy(np.int64)
        lab = planted_label(df)
        b = (margin + _OFF_BINS * bin_micro) // bin_micro - _OFF_BINS
        out = (
            pd.DataFrame({"bin_id": b, "n": 1, "n_pos": lab})
            .groupby("bin_id", sort=False)
            .sum()
            .reset_index()
        )
        return out.astype(np.int64)

    bins = (
        featurize_documents(docs_ds)
        .map_batches(partial, batch_format="pandas")
        .groupby("bin_id")
        .aggregate(Sum("n", alias_name="n"), Sum("n_pos", alias_name="n_pos"))
    )

    def rate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n"] = df["n"].astype(np.int64)
        df["n_pos"] = df["n_pos"].astype(np.int64)
        df["pos_rate_micro"] = (
            1_000_000 * df["n_pos"].to_numpy(np.int64)
        ) // df["n"].to_numpy(np.int64)
        return df

    return bins.map_batches(rate, batch_format="pandas")


def calibration_bins_sql(
    source: str = "documents", bin_micro: int = BIN_MICRO
) -> str:
    """DuckDB mirror of :func:`calibration_bins` — reuses the
    classifier's published feature/weight/label SQL expressions."""
    from .classifier import _features_cte, _margin_expr, planted_label_sql

    return (
        _features_cte(source)
        + f", cb AS (SELECT ({_margin_expr()}) AS margin, "
        + f"{planted_label_sql()} AS lab FROM f) "
        + f"SELECT CAST((margin + {_OFF_BINS * bin_micro}) // {bin_micro} "
        + f"- {_OFF_BINS} AS BIGINT) AS bin_id, "
        "COUNT(*) AS n, CAST(SUM(lab) AS BIGINT) AS n_pos, "
        "CAST((1000000 * SUM(lab)) // COUNT(*) AS BIGINT) AS pos_rate_micro "
        "FROM cb GROUP BY 1"
    )
