"""Cross-source quantile normalization — map every document's
``n_chars`` onto the GLOBAL length distribution at the equivalent
within-source quantile, removing per-source length bias before
length-sensitive curation thresholds (the batch-effect correction of
bioinformatics applied to corpus slices).

Value-level mapping (ties map identically, no per-document rank):
for source s and value v, the source rank is the cumulative count
``r = #{x in s : x <= v}`` and the normalized value is the smallest
global value whose cumulative count >= ``ceil(r * N / n_s)``. Every
quantity is an integer count, so both engines agree exactly.

Shape at 100 TB: ONE groupby over (source, n_chars) — bounded by
sources x distinct lengths, never the corpus — builds the mapping in
a single task; the mapping broadcasts in the task closure and the
second pass is a pure map. No rank shuffle, no per-document window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def quantile_normalize(docs_ds, value_col: str = "n_chars"):
    """documents -> (doc_id, source, n_chars, n_chars_qnorm)."""
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
        g = df.groupby(["source", "v"], sort=False).size().rename("cnt")
        g = g.reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: sources x distinct values
    )
    counts = counts.sort_values(["source", "v"]).reset_index(drop=True)
    gl = (
        counts.groupby("v", sort=True)["cnt"].sum().reset_index()
    )  # global value counts, ascending
    g_vals = gl["v"].to_numpy(np.int64)
    g_cum = gl["cnt"].to_numpy(np.int64).cumsum()
    n_total = int(g_cum[-1])
    mapping: dict = {}
    for src, sub in counts.groupby("source", sort=False):
        c = sub["cnt"].to_numpy(np.int64).cumsum()
        n_src = int(c[-1])
        # target rank ceil(r * N / n_src), then the smallest global
        # value with cumulative >= target
        tgt = (c * n_total + n_src - 1) // n_src
        pos = np.searchsorted(g_cum, tgt, side="left")
        for v, p in zip(sub["v"].to_numpy(np.int64), g_vals[pos]):
            mapping[(src, int(v))] = int(p)

    def apply(t: pa.Table) -> pa.Table:
        src = t.column("source").to_pandas()
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.fromiter(
            (mapping[(s, int(x))] for s, x in zip(src, v)),
            dtype=np.int64,
            count=len(v),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                value_col: pa.array(v, pa.int64()),
                f"{value_col}_qnorm": pa.array(q, pa.int64()),
            }
        )

    return docs_ds.map_batches(apply, batch_format="pyarrow")


def quantile_normalize_sql(
    source: str = "documents", value_col: str = "n_chars"
) -> str:
    """DuckDB mirror of :func:`quantile_normalize`."""
    return (
        f"WITH qn_c AS (SELECT source, {value_col} AS v, COUNT(*) AS cnt "
        f"FROM {source} GROUP BY 1, 2), "
        "qn_s AS (SELECT source, v, "
        "SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS r, "
        "SUM(cnt) OVER (PARTITION BY source) AS n_src FROM qn_c), "
        "qn_g AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS rg FROM "
        "(SELECT v, SUM(cnt) AS cnt FROM qn_c GROUP BY v)), "
        f"qn_n AS (SELECT COUNT(*) AS n FROM {source}), "
        "qn_m AS (SELECT s.source, s.v, "
        "(SELECT MIN(g.v) FROM qn_g g "
        "WHERE g.rg >= (s.r * qn_n.n + s.n_src - 1) // s.n_src) AS q "
        "FROM qn_s s, qn_n) "
        f"SELECT d.doc_id, d.source, d.{value_col}, "
        f"m.q AS {value_col}_qnorm "
        f"FROM {source} d JOIN qn_m m "
        f"ON m.source = d.source AND m.v = d.{value_col}"
    )
