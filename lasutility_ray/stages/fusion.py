"""Reciprocal-rank fusion (RRF, Cormack et al. 2009) of two document
rankings — the standard retrieval-fusion operator: each ranking
contributes ``1 / (k + rank)`` and documents strong under EITHER
signal surface. Here the fused signals are the corpus's two exact
text metrics (`text.text_stats`): quality millipoints and length.

Scale shape: each ranking is a PARTIAL top-``k_list`` (per-batch
sort+head bounds the shuffle at k rows per batch — the
`topk_per_group` shape with a constant group), so only 2 x k_list
rows ever leave the cluster; the fusion itself runs over those
k-bounded lists (driver-side like the BPE vocab loop — bounded by
the operator's k parameters, never by the corpus).

Exactness: contributions are integer micro-units
``1_000_000_000 // (k_rrf + rank)``, ranks are total orders
(metric DESC, doc_id ASC), ties in the fused score break on doc_id —
the DuckDB mirror reproduces all three with window functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

K_LIST = 100
K_OUT = 20
K_RRF = 60
_SCALE = 1_000_000_000


def rrf_fuse(docs_ds, k_list: int = K_LIST, k_out: int = K_OUT, k_rrf: int = K_RRF):
    """documents -> fused top-``k_out`` (doc_id, rrf_e9)."""
    import ray.data as rd

    from .relational import topk_per_group
    from .text import text_stats

    stats = (
        text_stats(docs_ds)
        .select_columns(["doc_id", "n_chars", "quality_millis"])
        .map_batches(
            lambda t: t.append_column(
                "__g", pa.array(np.zeros(len(t), np.int64))
            ),
            batch_format="pyarrow",
        )
        .materialize()  # consumed by BOTH rankings: pin the slim table
    )
    top_q = topk_per_group(stats, "__g", "quality_millis", "doc_id", k=k_list)
    top_n = topk_per_group(stats, "__g", "n_chars", "doc_id", k=k_list)

    # k-bounded fusion (2 * k_list rows total)
    a = top_q.select_columns(["doc_id", "rank"]).to_pandas()
    b = top_n.select_columns(["doc_id", "rank"]).to_pandas()
    contrib = pd.concat(
        [
            pd.DataFrame(
                {
                    "doc_id": f["doc_id"].to_numpy(np.int64),
                    "c": _SCALE // (k_rrf + f["rank"].to_numpy(np.int64)),
                }
            )
            for f in (a, b)
        ]
    )
    fused = (
        contrib.groupby("doc_id", sort=False)["c"]
        .sum()
        .reset_index(name="rrf_e9")
        .sort_values(["rrf_e9", "doc_id"], ascending=[False, True], kind="stable")
        .head(k_out)
        .reset_index(drop=True)
    )
    fused["rrf_e9"] = fused["rrf_e9"].astype(np.int64)
    return rd.from_pandas(fused[["doc_id", "rrf_e9"]])


def rrf_fuse_sql(
    stats_cte: str,
    k_list: int = K_LIST,
    k_out: int = K_OUT,
    k_rrf: int = K_RRF,
) -> str:
    """DuckDB mirror; ``stats_cte`` must define ``rrf_s(doc_id,
    n_chars, quality_millis)`` (the q_token_stats arithmetic)."""
    return (
        f"WITH {stats_cte}, "
        "rrf_a AS (SELECT doc_id, row_number() OVER "
        "(ORDER BY quality_millis DESC, doc_id) AS r FROM rrf_s "
        f"QUALIFY r <= {k_list}), "
        "rrf_b AS (SELECT doc_id, row_number() OVER "
        "(ORDER BY n_chars DESC, doc_id) AS r FROM rrf_s "
        f"QUALIFY r <= {k_list}), "
        "rrf_u AS (SELECT doc_id, "
        f"{_SCALE} // ({k_rrf} + r) AS c FROM rrf_a "
        f"UNION ALL SELECT doc_id, {_SCALE} // ({k_rrf} + r) FROM rrf_b) "
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_e9 FROM rrf_u "
        "GROUP BY doc_id ORDER BY rrf_e9 DESC, doc_id "
        f"LIMIT {k_out}"
    )
