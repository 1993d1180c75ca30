"""Neighborhood-max (peak) query over the tiled cell grid — the J6
range/window query of SURVEY.md §2.4.

Reference semantics (``VoxelGrid.cs:267-303``
``IsHighestBinInNeighborhood``): a cell is a *peak* iff its best
in-class-range point is **strictly higher** than every neighbor cell's
best within Chebyshev radius ``r`` (equal-height neighbors
disqualify). The reference evaluates it inside one in-memory grid;
the engine generalizes it across tile boundaries with a **halo
exchange**:

1. per-batch partial max per global cell ``(gr, gc) =
   (floor(y/cell), floor(x/cell))`` — the combiner that keeps the
   shuffle small (one row per touched cell per batch, not per point);
2. each partial row is emitted to its own tile and to every neighbor
   tile whose window can see it (cells within ``r`` of a tile edge —
   the halo rows);
3. ``groupby(tile_id)``: combine partials (max), build the local
   dense best-z window including the halo ring, and run the
   vectorized strict-max filter for owned cells only.

Exact for any radius ``r <= CELLS_PER_EDGE`` because the halo ring
carries every cell a window can reach across the boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geom import tilenamer
from .tiling import CELL_SIZE_M, CELLS_PER_EDGE, TILE_SIZE_M

RADIUS_CELLS = 2


class _PartialPeaks:
    """Batch combiner + halo replicator (stateless; plain function
    semantics, class only to bind parameters once)."""

    def __init__(self, lo: int, hi: int, radius: int):
        self.lo = lo
        self.hi = hi
        self.radius = radius

    @staticmethod
    def _empty() -> pa.Table:
        return pa.table(
            {
                "tile_id": pa.array([], pa.string()),
                "gr": pa.array([], pa.int64()),
                "gc": pa.array([], pa.int64()),
                "best": pa.array([], pa.float64()),
            }
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        cls = t.column("classification").to_numpy()
        keep = (cls >= self.lo) & (cls <= self.hi)
        x = t.column("x").to_numpy()[keep]
        y = t.column("y").to_numpy()[keep]
        z = t.column("z").to_numpy()[keep]
        if len(x) == 0:
            return self._empty()

        gr = np.floor(y / CELL_SIZE_M).astype(np.int64)
        gc = np.floor(x / CELL_SIZE_M).astype(np.int64)

        # per-batch partial max per cell (the combiner)
        key = gr * (1 << 32) + gc
        order = np.argsort(key, kind="stable")
        ks = key[order]
        zs = z[order]
        starts = np.flatnonzero(np.diff(ks, prepend=ks[0] - 1) != 0)
        best = np.maximum.reduceat(zs, starts)
        ugr = gr[order][starts]
        ugc = gc[order][starts]

        # owner tile + halo replication to neighbors that can see us
        cells_per_tile = CELLS_PER_EDGE
        tr = ugr // cells_per_tile  # tile row index (north)
        tc = ugc // cells_per_tile
        lr = ugr - tr * cells_per_tile  # in-tile cell row
        lc = ugc - tc * cells_per_tile

        out_gr, out_gc, out_best, out_te, out_tn = [], [], [], [], []
        r = self.radius
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    m = np.ones(len(ugr), dtype=bool)
                else:
                    m = np.ones(len(ugr), dtype=bool)
                    if dr == -1:
                        m &= lr < r
                    elif dr == 1:
                        m &= lr >= cells_per_tile - r
                    if dc == -1:
                        m &= lc < r
                    elif dc == 1:
                        m &= lc >= cells_per_tile - r
                if not m.any():
                    continue
                te = (tc[m] + dc) * TILE_SIZE_M
                tn = (tr[m] + dr) * TILE_SIZE_M
                ok = (
                    (te >= tilenamer.MIN_ALLOWED_EAST)
                    & (te < tilenamer.MAX_ALLOWED_EAST)
                    & (tn >= tilenamer.MIN_ALLOWED_NORTH)
                    & (tn < tilenamer.MAX_ALLOWED_NORTH)
                )
                if not ok.any():
                    continue
                idx = np.flatnonzero(m)[ok]
                out_gr.append(ugr[idx])
                out_gc.append(ugc[idx])
                out_best.append(best[idx])
                out_te.append(te[ok].astype(np.float64))
                out_tn.append(tn[ok].astype(np.float64))

        if not out_te:
            # every candidate cell mapped to tiles outside the allowed
            # NLS range — same empty result as a filtered-out batch
            return self._empty()
        te = np.concatenate(out_te)
        tn = np.concatenate(out_tn)
        tile_id = tilenamer.encode(te, tn, TILE_SIZE_M)
        return pa.table(
            {
                "tile_id": pa.array(tile_id, pa.string()),
                "gr": pa.array(np.concatenate(out_gr), pa.int64()),
                "gc": pa.array(np.concatenate(out_gc), pa.int64()),
                "best": pa.array(np.concatenate(out_best), pa.float64()),
            }
        )


def _peaks_in_tile(radius: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # combine partials (same cell may arrive from many batches)
        agg = g.groupby(["gr", "gc"], sort=True)["best"].max().reset_index()
        gr = agg["gr"].to_numpy()
        gc = agg["gc"].to_numpy()
        best = agg["best"].to_numpy()

        # tile owner = the mode of this group's key; owned cells are
        # the ones whose cell lies inside this tile
        tile_id = g["tile_id"].iloc[0]
        env = tilenamer.decode(tile_id)
        r0 = int(env[1]) // int(CELL_SIZE_M)  # first owned row
        c0 = int(env[0]) // int(CELL_SIZE_M)
        n = CELLS_PER_EDGE

        # dense local window incl. halo ring
        pad = radius
        grid = np.full((n + 2 * pad, n + 2 * pad), -np.inf)
        rr = gr - r0 + pad
        cc = gc - c0 + pad
        inb = (rr >= 0) & (rr < n + 2 * pad) & (cc >= 0) & (cc < n + 2 * pad)
        grid[rr[inb], cc[inb]] = best[inb]

        # strict-max filter over the Chebyshev window (shifted fmax)
        neigh = np.full((n, n), -np.inf)
        for dr in range(-radius, radius + 1):
            for dc in range(-radius, radius + 1):
                if dr == 0 and dc == 0:
                    continue
                neigh = np.fmax(
                    neigh,
                    grid[pad + dr : pad + dr + n, pad + dc : pad + dc + n],
                )
        center = grid[pad : pad + n, pad : pad + n]
        is_peak = np.isfinite(center) & (center > neigh)
        pr, pc_ = np.nonzero(is_peak)
        return pd.DataFrame(
            {
                "gr": pd.Series(pr + r0, dtype="int64"),
                "gc": pd.Series(pc_ + c0, dtype="int64"),
                "best": pd.Series(center[pr, pc_], dtype="float64"),
            }
        )

    return fn


def neighborhood_peaks_ds(points_ds, lo: int, hi: int, radius: int = RADIUS_CELLS):
    """(gr, gc, best) for every peak cell: best-in-class-range value
    strictly higher than all cells within Chebyshev ``radius`` —
    including across tile boundaries (halo exchange)."""
    if not 0 < radius <= CELLS_PER_EDGE:
        raise ValueError("radius must be within one tile edge")
    partials = points_ds.map_batches(
        _PartialPeaks(lo, hi, radius), batch_format="pyarrow"
    )
    return partials.groupby("tile_id").map_groups(
        _peaks_in_tile(radius), batch_format="pandas"
    )


class _PartialCounts:
    """Density sibling of ``_PartialPeaks``: per-batch per-cell point
    COUNT partials (sums are associative, so the same halo
    replication is exact) — no class filter."""

    def __init__(self, radius: int):
        self.radius = radius

    @staticmethod
    def _empty() -> pa.Table:
        return pa.table(
            {
                "tile_id": pa.array([], pa.string()),
                "gr": pa.array([], pa.int64()),
                "gc": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy()
        y = t.column("y").to_numpy()
        if len(x) == 0:
            return self._empty()
        gr = np.floor(y / CELL_SIZE_M).astype(np.int64)
        gc = np.floor(x / CELL_SIZE_M).astype(np.int64)
        key = gr * (1 << 32) + gc
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.diff(ks, prepend=ks[0] - 1) != 0)
        cnt = np.diff(np.append(starts, len(ks)))
        ugr = gr[order][starts]
        ugc = gc[order][starts]

        cells_per_tile = CELLS_PER_EDGE
        tr = ugr // cells_per_tile
        tc = ugc // cells_per_tile
        lr = ugr - tr * cells_per_tile
        lc = ugc - tc * cells_per_tile

        out_gr, out_gc, out_cnt, out_te, out_tn = [], [], [], [], []
        r = self.radius
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                m = np.ones(len(ugr), dtype=bool)
                if dr == -1:
                    m &= lr < r
                elif dr == 1:
                    m &= lr >= cells_per_tile - r
                if dc == -1:
                    m &= lc < r
                elif dc == 1:
                    m &= lc >= cells_per_tile - r
                if not m.any():
                    continue
                te = (tc[m] + dc) * TILE_SIZE_M
                tn = (tr[m] + dr) * TILE_SIZE_M
                ok = (
                    (te >= tilenamer.MIN_ALLOWED_EAST)
                    & (te < tilenamer.MAX_ALLOWED_EAST)
                    & (tn >= tilenamer.MIN_ALLOWED_NORTH)
                    & (tn < tilenamer.MAX_ALLOWED_NORTH)
                )
                if not ok.any():
                    continue
                idx = np.flatnonzero(m)[ok]
                out_gr.append(ugr[idx])
                out_gc.append(ugc[idx])
                out_cnt.append(cnt[idx])
                out_te.append(te[ok].astype(np.float64))
                out_tn.append(tn[ok].astype(np.float64))
        if not out_te:
            return self._empty()
        te = np.concatenate(out_te)
        tn = np.concatenate(out_tn)
        tile_id = tilenamer.encode(te, tn, TILE_SIZE_M)
        return pa.table(
            {
                "tile_id": pa.array(tile_id, pa.string()),
                "gr": pa.array(np.concatenate(out_gr), pa.int64()),
                "gc": pa.array(np.concatenate(out_gc), pa.int64()),
                "cnt": pa.array(np.concatenate(out_cnt).astype(np.int64), pa.int64()),
            }
        )


def _density_in_tile(radius: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["gr", "gc"], sort=True)["cnt"].sum().reset_index()
        gr = agg["gr"].to_numpy()
        gc = agg["gc"].to_numpy()
        cnt = agg["cnt"].to_numpy(np.int64)

        tile_id = g["tile_id"].iloc[0]
        env = tilenamer.decode(tile_id)
        r0 = int(env[1]) // int(CELL_SIZE_M)
        c0 = int(env[0]) // int(CELL_SIZE_M)
        n = CELLS_PER_EDGE
        pad = radius
        grid = np.zeros((n + 2 * pad, n + 2 * pad), np.int64)
        rr = gr - r0 + pad
        cc = gc - c0 + pad
        inb = (rr >= 0) & (rr < n + 2 * pad) & (cc >= 0) & (cc < n + 2 * pad)
        grid[rr[inb], cc[inb]] = cnt[inb]

        dens = np.zeros((n, n), np.int64)
        for dr in range(-radius, radius + 1):
            for dc in range(-radius, radius + 1):
                dens += grid[pad + dr : pad + dr + n, pad + dc : pad + dc + n]
        center = grid[pad : pad + n, pad : pad + n]
        pr, pc_ = np.nonzero(center > 0)  # owned OCCUPIED cells only
        return pd.DataFrame(
            {
                "gr": pd.Series(pr + r0, dtype="int64"),
                "gc": pd.Series(pc_ + c0, dtype="int64"),
                "n_density": pd.Series(dens[pr, pc_], dtype="int64"),
            }
        )

    return fn


def cell_density_ds(points_ds, radius: int = RADIUS_CELLS):
    """(gr, gc, n_density) box-sum point density per occupied cell —
    the kernel-density-lite heatmap raster, exact across tile borders
    via the same halo exchange as the peaks query (sums associate, so
    partial counts replicate losslessly)."""
    if not 0 < radius <= CELLS_PER_EDGE:
        raise ValueError("radius must be within one tile edge")
    partials = points_ds.map_batches(
        _PartialCounts(radius), batch_format="pyarrow"
    )
    return partials.groupby("tile_id").map_groups(
        _density_in_tile(radius), batch_format="pandas"
    )
