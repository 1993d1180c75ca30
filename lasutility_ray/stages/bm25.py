"""BM25 ranked retrieval over the documents table.

The retrieval-side complement of ``chunking.inverted_index``: given a
fixed query-term set, score every matching document with the Okapi
BM25 formula (k1 = 1.2, b = 0.75).

Exactness: per-term contributions are quantized to integer
*micro-units* ``floor(1e6 * idf_t * tf_norm)`` and summed as int64 —
order-independent, so the score is identical across partitionings and
vs the DuckDB oracle (the ``lm.py`` millibit precedent: numpy ``log``
and DuckDB ``ln`` agree bit-for-bit on these inputs, and every float
expression below is written with the SAME literal operand order as
the SQL).

100 TB shape: phase A is a map-side partial -> ONE global stats row
(doc count, total length, per-term document frequencies) reduced to
driver scalars; phase B is a broadcast map-only rescan (idf/avgdl
ride the task closure) — no shuffle touches a per-document row.
Candidate generation at scale would come from
``inverted_index(min_df=...)`` posting intersections; here every doc
is scored so the oracle can mirror the full set.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

TOKEN_RE = "[a-z0-9]+"
K1 = 1.2
B = 0.75
QUERY_TERMS = ("tile", "crawl", "window")


def _term_stats(t: pa.Table, terms: tuple, text_col: str) -> pa.Table:
    """Per-doc dl + tf per query term (vectorized findall pass)."""
    import pandas as pd

    pat = re.compile(TOKEN_RE)
    toks = t.column(text_col).to_pandas().str.lower().str.findall(pat)
    dl = toks.map(len).to_numpy(dtype=np.int64)
    cols = {
        "doc_id": t.column("doc_id"),
        "dl": pa.array(dl, pa.int64()),
    }
    for q, term in enumerate(terms):
        tf = toks.map(lambda ws, term=term: ws.count(term)).to_numpy(dtype=np.int64)
        cols[f"tf{q}"] = pa.array(tf, pa.int64())
    return pa.table(cols)


def corpus_stats(docs_ds, terms: tuple = QUERY_TERMS, text_col: str = "text"):
    """One reduced row -> (n_docs, total_dl, df per term) as ints."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        st = _term_stats(t, terms, text_col)
        row = {
            "n": [t.num_rows],
            "tot": [int(st.column("dl").to_numpy().sum())],
        }
        for q in range(len(terms)):
            row[f"df{q}"] = [int((st.column(f"tf{q}").to_numpy() > 0).sum())]
        return pa.table(row)

    aggs = [Sum("n", alias_name="n"), Sum("tot", alias_name="tot")] + [
        Sum(f"df{q}", alias_name=f"df{q}") for q in range(len(terms))
    ]
    out = docs_ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)
    return out


def bm25_scores(docs_ds, terms: tuple = QUERY_TERMS, text_col: str = "text"):
    """documents -> (doc_id, n_hit_terms, score_micro) for every doc
    containing at least one query term."""
    stats = corpus_stats(docs_ds, terms, text_col)
    n = int(stats["n"])
    tot = int(stats["tot"])
    avgdl = float(tot) / float(n)
    idf = [
        float(np.log((n - int(stats[f"df{q}"]) + 0.5) / (int(stats[f"df{q}"]) + 0.5) + 1.0))
        for q in range(len(terms))
    ]

    def score(t: pa.Table) -> pa.Table:
        st = _term_stats(t, terms, text_col)
        dl = st.column("dl").to_numpy()
        score_micro = np.zeros(t.num_rows, dtype=np.int64)
        hits = np.zeros(t.num_rows, dtype=np.int64)
        denom_tail = K1 * (0.25 + 0.75 * dl / avgdl)
        for q in range(len(terms)):
            tf = st.column(f"tf{q}").to_numpy()
            tfn = tf * 2.2 / (tf + denom_tail)
            contrib = np.floor(1000000.0 * idf[q] * tfn).astype(np.int64)
            score_micro += np.where(tf > 0, contrib, 0)
            hits += (tf > 0).astype(np.int64)
        keep = hits > 0
        return pa.table(
            {
                "doc_id": st.column("doc_id").filter(pa.array(keep)),
                "n_hit_terms": pa.array(hits[keep], pa.int64()),
                "score_micro": pa.array(score_micro[keep], pa.int64()),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")


def bm25_sql(terms: tuple = QUERY_TERMS, src: str = "documents") -> str:
    """DuckDB mirror — identical literal operand order everywhere."""
    tf_cols = ", ".join(
        f"length(list_filter(ts, x -> x = '{t}')) AS tf{q}"
        for q, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{q} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{q}"
        for q in range(len(terms))
    )
    avgdl = "(CAST(g.tot AS DOUBLE) / CAST(g.n AS DOUBLE))"
    parts = []
    hit_parts = []
    for q in range(len(terms)):
        idf = f"ln((g.n - g.df{q} + 0.5) / (g.df{q} + 0.5) + 1.0)"
        tfn = f"(tf{q} * 2.2 / (tf{q} + 1.2 * (0.25 + 0.75 * dl / {avgdl})))"
        parts.append(
            f"(CASE WHEN tf{q} > 0 THEN "
            f"CAST(floor(1000000.0 * {idf} * {tfn}) AS BIGINT) ELSE 0 END)"
        )
        hit_parts.append(f"(CASE WHEN tf{q} > 0 THEN 1 ELSE 0 END)")
    return (
        f"WITH bm_t AS (SELECT doc_id, regexp_extract_all(lower(text), "
        f"'{TOKEN_RE}') AS ts FROM {src}), "
        f"bm_s AS (SELECT doc_id, length(ts) AS dl, {tf_cols} FROM bm_t), "
        f"bm_g AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        f"CAST(sum(dl) AS BIGINT) AS tot, {df_cols} FROM bm_s) "
        f"SELECT doc_id, CAST({' + '.join(hit_parts)} AS BIGINT) AS n_hit_terms, "
        f"CAST({' + '.join(parts)} AS BIGINT) AS score_micro "
        f"FROM bm_s, bm_g g WHERE {' + '.join(f'tf{q}' for q in range(len(terms)))} > 0"
    )
