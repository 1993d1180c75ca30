"""Raster region labeling ("region group"): connected components of
the OCCUPIED 500 m DEM cells under rook (4-neighbor) adjacency, each
cell labeled with its component's minimum flat cell id plus the region
size — the GIS primitive behind contiguous-zone extraction (urban
footprints, flood extents) over the same cell space as
stages/demslope.py / flowaccum.py.

Shape: occupancy is the usual bounded cell table (map-side partials ->
one cell-space groupby). Adjacency needs NO halo exchange and no dense
grid: each occupied cell emits its east/south neighbor key and ONE
``lookup_join`` against the occupancy table keeps exactly the edges
whose endpoint exists (semi-join on the cell key) — the shape that
holds when the cell space is NOT bounded. Components then reuse
``dedup.duplicate_components`` (one-task pointer-doubling CC with the
forced-distributed label-propagation fallback); self-edges make
singleton cells first-class. SQL mirror: recursive reachability
closure + min label over each reachable set (cells are bounded, the
closure is tiny)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .demslope import NCELL


def region_labels(docs_ds):
    """documents -> (ci, cj, rci, rcj, region_n) per occupied cell:
    rook-connected-region min-cell label and region size."""
    from .cogroup import lookup_join
    from .dedup import duplicate_components
    from .watershed import _cells_ds

    occ = _cells_ds(docs_ds).drop_columns(["z_cm"]).materialize()

    def probes(t: pa.Table) -> pa.Table:
        ci = t.column("ci").to_numpy()
        cj = t.column("cj").to_numpy()
        flat = ci * NCELL + cj
        # east + south probes (each undirected edge emitted once) and
        # a self-edge so singleton cells appear in the CC output
        east = np.stack([flat, flat + 1]).T[cj + 1 < NCELL]
        south = np.stack([flat, flat + NCELL]).T[ci + 1 < NCELL]
        self_e = np.stack([flat, flat]).T
        ab = np.concatenate([east, south, self_e])
        return pa.table(
            {
                "a": pa.array(ab[:, 0], pa.int64()),
                "b": pa.array(ab[:, 1], pa.int64()),
            }
        )

    def key_occ(t: pa.Table) -> pa.Table:
        ci = t.column("ci").to_numpy()
        cj = t.column("cj").to_numpy()
        return pa.table({"cell": pa.array(ci * NCELL + cj, pa.int64())})

    occ_keys = occ.map_batches(key_occ, batch_format="pyarrow").materialize()
    edges = lookup_join(
        occ.map_batches(probes, batch_format="pyarrow"),
        occ_keys,
        "b",
        "cell",
        {},
        how="semi",
    )
    comps = duplicate_components(edges).materialize()
    sizes = (
        comps.groupby("component")
        .count()
        .rename_columns({"count()": "region_n"})
        .materialize()
    )
    out = lookup_join(
        comps, sizes, "component", "component", {"region_n": "region_n"}
    )

    def unpack(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy()
        comp = t.column("component").to_numpy()
        return pa.table(
            {
                "ci": pa.array(node // NCELL, pa.int64()),
                "cj": pa.array(node % NCELL, pa.int64()),
                "rci": pa.array(comp // NCELL, pa.int64()),
                "rcj": pa.array(comp % NCELL, pa.int64()),
                "region_n": t.column("region_n").cast(pa.int64()),
            }
        )

    return out.map_batches(unpack, batch_format="pyarrow")


def region_labels_sql(source: str = "documents") -> str:
    """DuckDB mirror: same cell table (shared D8 CTE prefix — only
    fa_c is referenced), rook reachability closure, min-label +
    size per region."""
    from .flowaccum import d8_walk_cte

    return d8_walk_cte(source) + (
        f", rg_f AS (SELECT ci * {NCELL} + cj AS cell, ci, cj FROM fa_c), "
        "rg_e AS (SELECT a.cell AS u, b.cell AS v FROM rg_f a JOIN rg_f b "
        "ON (abs(a.ci - b.ci) + abs(a.cj - b.cj)) = 1), "
        "rg_r(src, cell) AS ("
        "SELECT cell, cell FROM rg_f "
        "UNION "
        "SELECT r.src, e.v FROM rg_r r JOIN rg_e e ON e.u = r.cell), "
        "rg_l AS (SELECT src, min(cell) AS label FROM rg_r GROUP BY src), "
        "rg_n AS (SELECT label, CAST(count(*) AS BIGINT) AS region_n "
        "FROM rg_l GROUP BY label) "
        f"SELECT l.src // {NCELL} AS ci, l.src % {NCELL} AS cj, "
        f"l.label // {NCELL} AS rci, l.label % {NCELL} AS rcj, n.region_n "
        "FROM rg_l l JOIN rg_n n ON n.label = l.label"
    )
