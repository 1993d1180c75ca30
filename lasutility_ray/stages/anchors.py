"""Anchor-token profiles per target host — the link-graph x text
composition behind anchor-text retrieval signals (what do pages that
LINK to a host lead with?): each document contributes its first token
to both hash-derived link targets, and every host keeps its top-k
anchor tokens.

The anchor stand-in is the document's FIRST whitespace token
lowercased (the synthetic corpus has no real <a> text; the extraction
is mirrored 1:1 in SQL via ``regexp_extract(text, '\\S+')``), and the
link targets are stages/graph.py's ``edge_targets`` derivation, so the
oracle shares both primitives with already-pinned queries.

Shape at 100 TB: per-batch (host, token) partial counts collapse each
batch to its distinct space before ONE groupby — bounded by hosts x
first-token vocab, never the corpus; top-k per host is an in-group
head over the bounded table (1000 host sites) with the deterministic
(count DESC, token ASC) order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TOP_K = 3


def anchor_token_topk(docs_ds, k: int = TOP_K):
    """documents -> (host_id, token, c): the top-``k`` first-token
    anchors per link-target host, (c DESC, token ASC) order."""
    from ray.data.aggregate import Sum

    from .graph import edge_targets

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        toks = (
            t.column("text")
            .to_pandas()
            .str.extract(r"(\S+)", expand=False)
            .str.lower()
        )
        src, d1, d2 = edge_targets(d)
        tok2 = pd.concat([toks, toks], ignore_index=True)
        s = np.concatenate([src, src])
        h = np.concatenate([d1, d2])
        keep = (s != h) & tok2.notna().to_numpy()
        df = (
            pd.DataFrame({"host_id": h[keep], "token": tok2[keep].to_numpy()})
            .groupby(["host_id", "token"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "host_id": pa.array(df["host_id"].to_numpy(np.int64), pa.int64()),
                "token": pa.array(df["token"], pa.string()),
                "c": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
            }
        )

    counts = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["host_id", "token"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["c", "token"], ascending=[False, True], kind="stable"
        ).head(k)
        return g[["host_id", "token", "c"]]

    return counts.groupby("host_id").map_groups(topk, batch_format="pandas")


def anchor_token_sql(k: int = TOP_K, source: str = "documents") -> str:
    """DuckDB mirror of :func:`anchor_token_topk` — same edge and
    first-token derivations, row_number top-k."""
    from ..corpus.geocode import H1_MUL, M32
    from .graph import N_HOST_SITES

    h1 = f"((doc_id * {H1_MUL}) % {M32})"
    return (
        f"WITH at_raw AS (SELECT doc_id % {N_HOST_SITES} AS src, "
        f"{h1} % {N_HOST_SITES} AS d1, "
        f"({h1} // {N_HOST_SITES}) % {N_HOST_SITES} AS d2, "
        "lower(regexp_extract(text, '\\S+')) AS token "
        f"FROM {source} WHERE regexp_extract(text, '\\S+') IS NOT NULL "
        "AND regexp_extract(text, '\\S+') <> ''), "
        "at_l AS (SELECT d1 AS host_id, token FROM at_raw WHERE src <> d1 "
        "UNION ALL SELECT d2, token FROM at_raw WHERE src <> d2), "
        "at_c AS (SELECT host_id, token, CAST(count(*) AS BIGINT) AS c "
        "FROM at_l GROUP BY 1, 2), "
        "at_r AS (SELECT host_id, token, c, row_number() OVER ("
        "PARTITION BY host_id ORDER BY c DESC, token) AS rn FROM at_c) "
        f"SELECT host_id, token, c FROM at_r WHERE rn <= {k}"
    )
