"""Robust per-source outlier flags via median + MAD (median absolute
deviation) — the standard length-anomaly gate a curation pipeline runs
before trusting length-derived features (unlike mean/stddev, one
spam megapage cannot move the fence).

Both statistics are NEAREST-RANK order statistics (the ``(n+1)//2``-th
smallest, i.e. the lower median), so every quantity is an integer and
both engines agree exactly: no interpolation, no floats. The flag is
the classic ``|x - med| > k * MAD`` with k = 3, an integer comparison.

Shape at 100 TB: ONE groupby over (source, value) — bounded by
sources x distinct lengths, never the corpus — builds per-source
cumulative counts; medians and MADs fall out of two weighted
searchsorted passes in a single bounded task; the per-source fences
broadcast in the task closure and the second corpus pass is a pure
map. Same two-pass/bounded-table shape as stages/qnorm.py.

Reference framing: beyond-reference statistics family (SURVEY 2.11);
the reference has no robust statistics surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

K_MAD = 3  # fence multiplier


def _nearest_rank(vals: np.ndarray, cnts: np.ndarray) -> int:
    """Lower median of the weighted multiset (vals ascending)."""
    cum = cnts.cumsum()
    n = int(cum[-1])
    pos = int(np.searchsorted(cum, (n + 1) // 2, side="left"))
    return int(vals[pos])


def mad_outliers(docs_ds, value_col: str = "n_chars"):
    """documents -> (doc_id, source, n_chars, med, mad, is_outlier)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t.column("source").to_pandas(),
                "v": t.column(value_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = df.groupby(["source", "v"], sort=False).size().rename("cnt").reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: sources x distinct values
    )
    counts = counts.sort_values(["source", "v"]).reset_index(drop=True)
    fences: dict = {}
    for src, sub in counts.groupby("source", sort=False):
        v = sub["v"].to_numpy(np.int64)
        c = sub["cnt"].to_numpy(np.int64)
        med = _nearest_rank(v, c)
        dev = np.abs(v - med)
        order = np.argsort(dev, kind="stable")
        # collapse equal deviations (two values can share |v - med|)
        dv, inv = np.unique(dev[order], return_inverse=True)
        dc = np.zeros(len(dv), np.int64)
        np.add.at(dc, inv, c[order])
        mad = _nearest_rank(dv, dc)
        fences[src] = (med, mad)

    def apply(t: pa.Table) -> pa.Table:
        src = t.column("source").to_pandas()
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        med = np.fromiter(
            (fences[s][0] for s in src), dtype=np.int64, count=len(v)
        )
        mad = np.fromiter(
            (fences[s][1] for s in src), dtype=np.int64, count=len(v)
        )
        out = np.abs(v - med) > K_MAD * mad
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                value_col: pa.array(v, pa.int64()),
                "med": pa.array(med, pa.int64()),
                "mad": pa.array(mad, pa.int64()),
                "is_outlier": pa.array(out, pa.bool_()),
            }
        )

    return docs_ds.map_batches(apply, batch_format="pyarrow")


def mad_outliers_sql(source: str = "documents", value_col: str = "n_chars") -> str:
    """DuckDB mirror of :func:`mad_outliers` — same nearest-rank
    medians from the same bounded (source, value) count table."""
    return (
        f"WITH mo_c AS (SELECT source, {value_col} AS v, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM {source} GROUP BY 1, 2), "
        "mo_s AS (SELECT source, v, "
        "SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS r, "
        "SUM(cnt) OVER (PARTITION BY source) AS n FROM mo_c), "
        "mo_med AS (SELECT source, MIN(v) AS med FROM mo_s "
        "WHERE r >= (n + 1) // 2 GROUP BY source), "
        "mo_d AS (SELECT c.source, abs(c.v - m.med) AS dv, "
        "SUM(c.cnt) AS cnt FROM mo_c c JOIN mo_med m ON m.source = c.source "
        "GROUP BY 1, 2), "
        "mo_ds AS (SELECT source, dv, "
        "SUM(cnt) OVER (PARTITION BY source ORDER BY dv) AS r, "
        "SUM(cnt) OVER (PARTITION BY source) AS n FROM mo_d), "
        "mo_mad AS (SELECT source, MIN(dv) AS mad FROM mo_ds "
        "WHERE r >= (n + 1) // 2 GROUP BY source) "
        f"SELECT d.doc_id, d.source, d.{value_col}, m.med, a.mad, "
        f"(abs(d.{value_col} - m.med) > {K_MAD} * a.mad) AS is_outlier "
        f"FROM {source} d JOIN mo_med m ON m.source = d.source "
        "JOIN mo_mad a ON a.source = d.source"
    )
