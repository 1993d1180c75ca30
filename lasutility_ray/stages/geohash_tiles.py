"""Geohash cell aggregation over geocoded documents — the third cell
system next to km tiles and S2 (see geom/geohash.py for why the codec
subdivides the projected envelope).

``geohash_counts``: pure map to a prefix-ordered cell string + ONE
groupby-count (the engine's standard tiling shuffle shape — compare
tilenamer/S2/hexbin). ``geohash_prefix_rollup`` exploits THE geohash
property — a prefix IS the parent cell — so the rollup re-aggregates
the (bounded) fine-cell table with plain string ``substr``, never
touching the corpus again.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import geohash as gh
from .snap import point_mm


def geohash_counts(docs_ds, precision: int = 4):
    """documents -> (geohash, n_docs) at ``precision`` chars."""
    from ray.data.aggregate import Count

    def cells(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        px, py = point_mm(d)
        return pa.table({"geohash": pa.array(gh.encode(px, py, precision))})

    return (
        docs_ds.map_batches(cells, batch_format="pyarrow")
        .groupby("geohash")
        .aggregate(Count(alias_name="n_docs"))
    )


def geohash_prefix_rollup(docs_ds, precision: int = 4, parent: int = 2):
    """Fine-cell counts rolled up to ``parent`` chars via the prefix
    property — one substr + re-aggregate over the cell-bounded table."""
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    fine = geohash_counts(docs_ds, precision)

    def cut(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "geohash": pc.utf8_slice_codeunits(
                    t.column("geohash"), 0, parent
                ),
                "n_docs": t.column("n_docs"),
            }
        )

    return (
        fine.map_batches(cut, batch_format="pyarrow")
        .groupby("geohash")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def _points_cte(source: str) -> str:
    from ..corpus.geocode import H1_MUL, H2_ADD, H2_MUL, M32
    from .snap import W

    h1 = f"((doc_id * {H1_MUL}) % {M32})"
    h2 = f"((doc_id * {H2_MUL} + {H2_ADD}) % {M32})"
    return (
        f"gh_p AS (SELECT doc_id, "
        f"CASE WHEN doc_id % 10 < 3 THEN 6000000 + (doc_id % 4) * 1000000 "
        f"+ {h1} % 1000000 ELSE {h1} % {W} END AS px, "
        f"CASE WHEN doc_id % 10 < 3 THEN 6000000 + {h2} % 1000000 "
        f"ELSE {h2} % {W} END AS py FROM {source})"
    )


def geohash_counts_sql(source: str = "documents", precision: int = 4) -> str:
    """DuckDB mirror of :func:`geohash_counts` (bit-generated code)."""
    expr = gh.encode_sql("px", "py", precision)
    return (
        f"WITH {_points_cte(source)} "
        f"SELECT {expr} AS geohash, COUNT(*) AS n_docs "
        "FROM gh_p GROUP BY geohash"
    )


def geohash_prefix_rollup_sql(
    source: str = "documents", precision: int = 4, parent: int = 2
) -> str:
    """DuckDB mirror of :func:`geohash_prefix_rollup`."""
    return (
        f"SELECT substr(geohash, 1, {parent}) AS geohash, "
        "CAST(SUM(n_docs) AS BIGINT) AS n_docs FROM ("
        + geohash_counts_sql(source, precision)
        + ") GROUP BY 1"
    )
