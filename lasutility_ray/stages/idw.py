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
exact for radius <= tile edge. ``z`` rides the halo rows (never
re-derived from doc_id).

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
    if radius > TILE:
        raise ValueError("radius must be <= tile edge for 1-ring halo exactness")
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
        rows = {"q_doc_id": [], "idw_z": [], "n_neighbors": []}
        for i in range(len(qid)):
            m = (d2[i] <= r2) & (cid != qid[i])
            if not m.any():
                continue
            di = d2[i][m]
            zi = cz[m]
            exact = di == 0.0
            if exact.any():
                val = float(zi[exact].min())  # coincident: IDW limit (min z tie rule)
            else:
                w = 1.0 / di
                val = float((zi * w).sum() / w.sum())
            rows["q_doc_id"].append(qid[i])
            rows["idw_z"].append(round(val, 6))
            rows["n_neighbors"].append(int(m.sum()))
        if not rows["q_doc_id"]:
            return empty
        return pd.DataFrame(
            {
                "q_doc_id": pd.Series(rows["q_doc_id"], dtype="int64"),
                "idw_z": pd.Series(rows["idw_z"], dtype="float64"),
                "n_neighbors": pd.Series(rows["n_neighbors"], dtype="int64"),
            }
        )

    return both.groupby("tile_id").map_groups(per_tile, batch_format="pandas")
