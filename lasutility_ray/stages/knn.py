"""Spatial kNN over tiled points with halo exchange.

Radius-bounded kNN for ANY radius: every point is a *candidate* in
its own tile, and points within ``radius`` of the surrounding
ceil(radius/edge)-ring of tiles are replicated there (masked halo
rows, the J6 pattern of SURVEY.md §2.4); query points stay keyed by
their own tile. One ``groupby(tile_id)`` co-groups queries with all
candidates that can be within the radius, so the per-tile brute-force
is exact while the shuffle stays near the information-theoretic
minimum (~(1 + 4*radius/edge)x for radius <= edge).

Distance ranking uses squared distance (same IEEE ops as the SQL
oracle: ``(dx*dx + dy*dy)``), ties broken by neighbor doc_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geom import tilenamer

RADIUS_M = 500.0
K_NEIGHBORS = 3
TILE = 1000


def _halo_candidates(batch: pa.Table, radius: float = RADIUS_M) -> pa.Table:
    """Each point -> a row keyed by its own tile, plus replica rows for
    every tile in the ceil(radius/edge)-ring whose envelope lies
    within ``radius`` of the point (a point farther than the radius
    from a tile can never serve a query in it). The per-axis
    envelope-distance mask keeps the co-group shuffle near the
    information-theoretic minimum instead of unconditional
    (2k+1)^2 replication (mask pattern of
    ``neighborhood.py:_PartialPeaks``). ``z`` is carried through when
    present so downstream interpolators never re-derive it."""
    x = batch.column("x").to_numpy()
    y = batch.column("y").to_numpy()
    doc_id = batch.column("doc_id").to_numpy()
    has_z = "z" in batch.column_names
    z = batch.column("z").to_numpy() if has_z else None
    te = np.floor(x / TILE).astype(np.int64) * TILE
    tn = np.floor(y / TILE).astype(np.int64) * TILE

    ring = int(np.ceil(radius / TILE))
    xs, ys, ids, zs, keys = [], [], [], [], []
    for i in range(-ring, ring + 1):
        for j in range(-ring, ring + 1):
            ce = te + i * TILE
            cn = tn + j * TILE
            # per-axis distance from the point to the neighbor tile's
            # envelope (0 when the point projects inside it); the
            # conjunction is a superset of the true corner distance —
            # conservative, never drops a needed candidate
            dist_x = np.maximum(ce - x, x - (ce + TILE))
            dist_y = np.maximum(cn - y, y - (cn + TILE))
            ok = (np.maximum(dist_x, 0) <= radius) & (np.maximum(dist_y, 0) <= radius)
            ok &= (
                (ce >= tilenamer.MIN_ALLOWED_EAST)
                & (ce < tilenamer.MAX_ALLOWED_EAST)
                & (cn >= tilenamer.MIN_ALLOWED_NORTH)
                & (cn < tilenamer.MAX_ALLOWED_NORTH)
            )
            if not ok.any():
                continue
            keys.append(tilenamer.encode(ce[ok], cn[ok], TILE))
            xs.append(x[ok])
            ys.append(y[ok])
            ids.append(doc_id[ok])
            if has_z:
                zs.append(z[ok])
    cols = {
        "tile_id": pa.array(np.concatenate(keys), pa.string()),
        "doc_id": pa.array(np.concatenate(ids), pa.int64()),
        "x": pa.array(np.concatenate(xs), pa.float64()),
        "y": pa.array(np.concatenate(ys), pa.float64()),
    }
    if has_z:
        cols["z"] = pa.array(np.concatenate(zs), pa.float64())
    return pa.table(cols)


def knn_join(points_ds, query_pred, k: int = K_NEIGHBORS, radius: float = RADIUS_M):
    """(query doc_id, neighbor doc_id, rank, d2) for every query point
    (query_pred selects queries from the same points table).

    Any radius is supported: the halo ring grows as
    ceil(radius / tile edge)."""
    r2 = radius * radius

    cands = points_ds.map_batches(
        lambda t: _halo_candidates(t, radius), batch_format="pyarrow"
    )

    def is_query(batch: pa.Table) -> pa.Table:
        mask = query_pred(batch.column("doc_id").to_numpy())
        t = batch.filter(pa.array(mask))
        return pa.table(
            {
                "tile_id": t.column("tile_id"),
                "q_doc_id": t.column("doc_id"),
                "qx": t.column("x"),
                "qy": t.column("y"),
            }
        )

    queries = points_ds.map_batches(is_query, batch_format="pyarrow")

    # co-group queries and halo candidates on tile_id via union +
    # role column (one shuffle)
    def tag(role):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("role", pa.array([role] * t.num_rows, pa.int8()))
        return fn

    qt = queries.map_batches(tag(0), batch_format="pyarrow").map_batches(
        lambda t: pa.table(
            {
                "tile_id": t.column("tile_id"),
                "id": t.column("q_doc_id"),
                "x": t.column("qx"),
                "y": t.column("qy"),
                "role": t.column("role"),
            }
        ),
        batch_format="pyarrow",
    )
    ct = cands.map_batches(tag(1), batch_format="pyarrow").map_batches(
        lambda t: pa.table(
            {
                "tile_id": t.column("tile_id"),
                "id": t.column("doc_id"),
                "x": t.column("x"),
                "y": t.column("y"),
                "role": t.column("role"),
            }
        ),
        batch_format="pyarrow",
    )
    both = qt.union(ct)

    def per_tile(g: pd.DataFrame) -> pd.DataFrame:
        q = g[g["role"] == 0]
        c = g[g["role"] == 1]
        if len(q) == 0 or len(c) == 0:
            return pd.DataFrame(
                {
                    "q_doc_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "rank": pd.Series(dtype="int64"),
                    "d2": pd.Series(dtype="float64"),
                }
            )
        qx = q["x"].to_numpy()[:, None]
        qy = q["y"].to_numpy()[:, None]
        cx = c["x"].to_numpy()[None, :]
        cy = c["y"].to_numpy()[None, :]
        dx = qx - cx
        dy = qy - cy
        d2 = dx * dx + dy * dy
        qids = q["id"].to_numpy()
        cids = c["id"].to_numpy()

        # fully vectorized top-k: flatten qualifying (query, candidate)
        # pairs, ONE lexsort by (query, d2, neighbor id) — identical
        # tie rule to the per-query loop — then keep within-group rank
        # < k via cumulative position
        mask = (d2 <= r2) & (cids[None, :] != qids[:, None])
        qi, ci = np.nonzero(mask)
        if len(qi) == 0:
            return pd.DataFrame(
                {
                    "q_doc_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "rank": pd.Series(dtype="int64"),
                    "d2": pd.Series(dtype="float64"),
                }
            )
        pd2 = d2[qi, ci]
        pcid = cids[ci]
        order = np.lexsort((pcid, pd2, qi))
        qs, ds_, ns = qi[order], pd2[order], pcid[order]
        first = np.flatnonzero(np.diff(qs, prepend=qs[0] - 1) != 0)
        group_start = np.repeat(first, np.diff(np.append(first, len(qs))))
        rank = np.arange(len(qs), dtype=np.int64) - group_start
        keep = rank < k
        return pd.DataFrame(
            {
                "q_doc_id": pd.Series(qids[qs[keep]], dtype="int64"),
                "neighbor_id": pd.Series(ns[keep], dtype="int64"),
                "rank": pd.Series(rank[keep] + 1, dtype="int64"),
                "d2": pd.Series(ds_[keep], dtype="float64"),
            }
        )

    return both.groupby("tile_id").map_groups(per_tile, batch_format="pandas")
