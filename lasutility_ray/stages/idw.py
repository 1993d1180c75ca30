"""Inverse-distance-weighted interpolation (raster<->vector probe).

The north-star pairs the TIN/barycentric path (stages/tin.py) with an
IDW alternative for nearest-neighbor interpolation. Query points
interpolate z from all neighbors within ``radius``:

    idw_z = sum(z_j / d2_j) / sum(1 / d2_j)      (power = 2)

With power 2 the weight is 1/d² — no sqrt, and the formula is exactly
reproducible in SQL for the DuckDB oracle. Same masked 1-ring halo
exchange as stages/knn.py: every point is a candidate in its own 1 km
tile and, when within ``radius`` of a border, in the adjacent tiles;
queries stay keyed by their own tile, so the per-tile brute force is
exact for any radius (the halo ring grows as ceil(radius/edge)).
``z`` rides the halo rows (never re-derived from doc_id).

Coincident points (d2 == 0) take the neighbor's z directly (the limit
of IDW); neighbors are summed in doc_id order so float accumulation
is deterministic; the result is rounded to 6 dp to be stable across
engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .knn import TILE, _halo_candidates

RADIUS_M = 500.0


def idw_join(points_ds, query_pred, radius: float = RADIUS_M):
    """(q_doc_id, idw_z, n_neighbors) per query point with >= 1
    neighbor within ``radius`` (self excluded)."""
    r2 = radius * radius

    # z is carried through the halo flat-map (never re-derived)
    cands = points_ds.map_batches(
        lambda t: _halo_candidates(t, radius), batch_format="pyarrow"
    )

    def tag_queries(t: pa.Table) -> pa.Table:
        mask = query_pred(t.column("doc_id").to_numpy())
        q = t.filter(pa.array(mask))
        return pa.table(
            {
                "tile_id": q.column("tile_id"),
                "doc_id": q.column("doc_id"),
                "x": q.column("x"),
                "y": q.column("y"),
                "z": q.column("z"),
                "role": pa.array(np.zeros(q.num_rows, dtype=np.int8)),
            }
        )

    def tag_cands(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tile_id": t.column("tile_id"),
                "doc_id": t.column("doc_id"),
                "x": t.column("x"),
                "y": t.column("y"),
                "z": t.column("z"),
                "role": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    qs = points_ds.map_batches(tag_queries, batch_format="pyarrow")
    cs = cands.map_batches(tag_cands, batch_format="pyarrow")
    both = qs.union(cs)

    def per_tile(g: pd.DataFrame) -> pd.DataFrame:
        q = g[g["role"] == 0]
        c = g[g["role"] == 1].sort_values("doc_id")  # deterministic sum order
        empty = pd.DataFrame(
            {
                "q_doc_id": pd.Series(dtype="int64"),
                "idw_z": pd.Series(dtype="float64"),
                "n_neighbors": pd.Series(dtype="int64"),
            }
        )
        if len(q) == 0 or len(c) == 0:
            return empty
        qx = q["x"].to_numpy()[:, None]
        qy = q["y"].to_numpy()[:, None]
        cx = c["x"].to_numpy()[None, :]
        cy = c["y"].to_numpy()[None, :]
        dx = qx - cx
        dy = qy - cy
        d2 = dx * dx + dy * dy
        qid = q["doc_id"].to_numpy()
        cid = c["doc_id"].to_numpy()
        cz = c["z"].to_numpy()

        # vectorized over all (query, neighbor) pairs: per-query sums
        # via bincount; the candidate side is pre-sorted by doc_id so
        # the accumulation order (and float result) matches the
        # per-query loop exactly
        mask = (d2 <= r2) & (cid[None, :] != qid[:, None])
        qi, ci = np.nonzero(mask)
        if len(qi) == 0:
            return empty
        pd2 = d2[qi, ci]
        pz = cz[ci]
        nq = len(qid)
        n_nb = np.bincount(qi, minlength=nq).astype(np.int64)

        exact = pd2 == 0.0
        has_exact = np.zeros(nq, dtype=bool)
        has_exact[qi[exact]] = True
        # coincident neighbors: IDW limit = min z among exact matches
        exact_min = np.full(nq, np.inf)
        np.minimum.at(exact_min, qi[exact], pz[exact])

        w = np.zeros(len(qi))
        nz = ~exact
        w[nz] = 1.0 / pd2[nz]
        wsum = np.bincount(qi, weights=w, minlength=nq)
        wzsum = np.bincount(qi, weights=w * pz, minlength=nq)

        hit = n_nb > 0
        val = np.where(
            has_exact, exact_min, np.divide(wzsum, np.where(wsum > 0, wsum, 1.0))
        )
        out_q = qid[hit]
        return pd.DataFrame(
            {
                "q_doc_id": pd.Series(out_q, dtype="int64"),
                "idw_z": pd.Series(np.round(val[hit], 6), dtype="float64"),
                "n_neighbors": pd.Series(n_nb[hit], dtype="int64"),
            }
        )

    return both.groupby("tile_id").map_groups(per_tile, batch_format="pandas")
