"""Skew salting: split hot tiles into sub-tile shuffle keys.

SURVEY.md §4: hash-groupby alone straggles on dense urban tiles. The
cure is the reference's own hierarchy — a 1 km tile subdivides into
2^level × 2^level sub-cells (the quad-split idea of
``Nls/TileNamer.cs:269-301``) — applied to the shuffle key:

1. **count pass**: per-batch partial ``(tile_id, n)`` counts combined
   on the driver (no shuffle; the partial table is tiny — one row per
   distinct tile per batch);
2. **salt**: points in hot tiles get an int64 ``salt_sub =
   (level << 16) | (sr << 8) | sc`` (cold tiles: -1; the shuffle key
   is the ``(tile_id, salt_sub)`` pair — integers group much faster
   than formatted strings); points within ``halo_m`` of a sub-cell
   border are *replicated* to the neighboring sub-cells with
   ``owned = False`` (TIN support only, never written);
3. **per-sub-cell work**: Delaunay TIN over owned+halo points,
   DEM/classification rasterized ONLY into the sub-cell's cell window
   (the ``LockedCells`` idea of ``Triangulation.cs:275-276`` — each
   sub-task owns a disjoint window), voxel DEM + gap fill over owned
   points;
4. **merge**: a second (tiny) groupby on ``tile_id`` pastes the
   disjoint windows into the full-tile raster and sums counters.

Two modes (tests/test_salting.py covers both):

- ``exact=True`` (default): **build once, rasterize split** — one
  task per hot tile builds the full-tile Delaunay TIN and ships the
  serialized triangulation to window tasks that rasterize/gap-fill
  disjoint windows of it. Output is bit-identical to the unsalted
  path by construction (same TIN, same tri ids, exact n_triangles);
  straggler wall time = one build + 1/n_windows of the raster work,
  total CPU ~= unsalted + serialization.
- ``exact=False``: **halo mode**, the extreme-skew path — windows get
  only their own points plus points within ``halo_m`` of their
  border, split level grows with density, and BUILD cost is divided
  too. The DEM is bit-identical wherever the containing Delaunay
  triangle's circumdisk is local (< ``halo_m``); convex-hull sliver
  triangles at the tile border can differ (measured < 0.5 % of cells
  on the urban fixture). Use when even one full-tile build would
  straggle a stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..geom.bounds import RasterBounds
from ..geom.tilenamer import decode
from ..geom.triangulation import SurfaceTriangulation
from ..geom import voxel as vx
from .tiling import CELL_SIZE_M, CELLS_PER_EDGE, TILE_SIZE_M

HOT_THRESHOLD = 4000  # points per 1 km tile before splitting
HALO_M = 30.0
MAX_LEVEL = 3  # 8x8 sub-cells

# Window boundaries are CELL-aligned: window i of an n_sub split covers
# raster cells [ceil(i*CELLS/n_sub), ceil((i+1)*CELLS/n_sub)) — so the
# windows tile the 100x100 cell grid exactly even when n_sub does not
# divide CELLS_PER_EDGE (level 3: 8 windows of 12/13 cells, NOT a
# uniform 125 m envelope pasted at 120 m offsets).


def _win_bound(i, n_sub):
    """First cell index of window ``i`` (vectorized-safe integer ceil)."""
    return (i * CELLS_PER_EDGE + n_sub - 1) // n_sub


def _win_of_cell(cell, n_sub):
    """Window index owning raster cell ``cell`` (inverse of _win_bound)."""
    return (cell * n_sub) // CELLS_PER_EDGE


def tile_count_partials(points_ds) -> dict[str, int]:
    """Count pass: per-batch partial counts combined by a tiny
    ``groupby(tile_id)`` shuffle; the driver receives ONE row per
    distinct tile (not per tile x batch — at 10^6+ batches the
    per-batch partial stream itself would flood the driver)."""
    from ray.data.aggregate import Sum

    # projection pushes down into a parquet scan when points_ds is a
    # fresh read — the count pass then reads ONE column, not the table
    points_ds = points_ds.select_columns(["tile_id"])

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("tile_id"))
        return pa.table(
            {
                "tile_id": vc.field("values"),
                "pn": vc.field("counts"),
            }
        )

    combined = (
        points_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tile_id")
        .aggregate(Sum("pn", alias_name="n"))
    )
    return {row["tile_id"]: int(row["n"]) for row in combined.take_all()}


def tile_hulls(points_ds, hot_tiles) -> dict[str, np.ndarray]:
    """Exact convex hull per HOT tile, computed distributively:
    per-batch partial hulls (tiny — O(hull) vertices per tile per
    batch) shuffle through one small ``groupby(tile_id)`` combine
    (hull(S) == hull(union of partial hulls)). The driver receives a
    few dozen vertices per hot tile. The hull is the certificate for
    halo-mode NaN cells: a cell corner strictly outside the tile hull
    is outside the full TIN too, so its NaN is exact."""
    from ..geom.hull import combine_hulls, convex_hull_xy

    hot_arr = np.sort(np.array(list(hot_tiles), dtype=object))
    if len(hot_arr) == 0:
        return {}

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("tile_id").to_numpy(zero_copy_only=False)
        # pd.Index.isin hashes; np.isin on object arrays degrades to
        # python-loop comparisons (minutes at millions of rows)
        m = pd.Index(ids).isin(hot_arr)
        if not m.any():
            return pa.table(
                {
                    "tile_id": pa.array([], pa.string()),
                    "hx": pa.array([], pa.float64()),
                    "hy": pa.array([], pa.float64()),
                }
            )
        ids = ids[m]
        x = t.column("x").to_numpy()[m]
        y = t.column("y").to_numpy()[m]
        out_id, out_x, out_y = [], [], []
        order = np.argsort(ids, kind="stable")
        bounds_ = np.flatnonzero(
            np.r_[True, ids[order][1:] != ids[order][:-1]]
        )
        for s, e in zip(bounds_, np.r_[bounds_[1:], len(order)]):
            sel = order[s:e]
            h = convex_hull_xy(x[sel], y[sel])
            out_id.append(np.full(len(h), ids[sel[0]], dtype=object))
            out_x.append(h[:, 0])
            out_y.append(h[:, 1])
        return pa.table(
            {
                "tile_id": pa.array(np.concatenate(out_id), pa.string()),
                "hx": pa.array(np.concatenate(out_x), pa.float64()),
                "hy": pa.array(np.concatenate(out_y), pa.float64()),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        h = combine_hulls(
            [np.column_stack((g["hx"].to_numpy(), g["hy"].to_numpy()))]
        )
        return pd.DataFrame(
            {
                "tile_id": [g["tile_id"].iloc[0]],
                "hull": [h.astype("<f8").tobytes()],
            }
        )

    rows = (
        points_ds.select_columns(["tile_id", "x", "y"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("tile_id")
        .map_groups(combine, batch_format="pandas")
        .take_all()
    )
    return {
        r["tile_id"]: np.frombuffer(r["hull"], dtype="<f8").reshape(-1, 2)
        for r in rows
    }


def salt_levels(
    counts: dict[str, int], threshold: int = HOT_THRESHOLD, exact: bool = False
) -> dict[str, int]:
    """tile -> split level (1 => 2x2 windows, 2 => 4x4, ...); only hot
    tiles appear. Exact (replicate-build) mode always uses level 1."""
    levels: dict[str, int] = {}
    for tile, n in counts.items():
        if n > threshold:
            if exact:
                levels[tile] = 1
            else:
                level = int(np.ceil(np.log2(max(n / threshold, 2.0)) / 2))
                levels[tile] = min(max(level, 1), MAX_LEVEL)
    return levels


def _salt_batch(t: pa.Table, levels: dict[str, int], halo_m: float) -> pa.Table:
    tile_ids = t.column("tile_id").to_numpy(zero_copy_only=False)
    lv = np.array([levels.get(k, 0) for k in tile_ids], dtype=np.int64)

    x = t.column("x").to_numpy()
    y = t.column("y").to_numpy()
    rel_x = x - np.floor(x / TILE_SIZE_M) * TILE_SIZE_M
    rel_y = y - np.floor(y / TILE_SIZE_M) * TILE_SIZE_M

    n_sub = 1 << lv  # sub-cells per edge
    ccol = np.minimum((rel_x / CELL_SIZE_M).astype(np.int64), CELLS_PER_EDGE - 1)
    crow = np.minimum((rel_y / CELL_SIZE_M).astype(np.int64), CELLS_PER_EDGE - 1)
    sc = _win_of_cell(ccol, n_sub)
    sr = _win_of_cell(crow, n_sub)
    # window envelopes in meters (cell-aligned, per point)
    wx0 = _win_bound(sc, n_sub) * CELL_SIZE_M
    wx1 = _win_bound(sc + 1, n_sub) * CELL_SIZE_M
    wy0 = _win_bound(sr, n_sub) * CELL_SIZE_M
    wy1 = _win_bound(sr + 1, n_sub) * CELL_SIZE_M

    keys, owned, take = [], [], []
    hot = lv > 0
    # salt_sub packs (level, sr, sc) into one int64 (-1 = cold tile):
    # integer group keys shuffle and group far faster than the
    # "{tile}#{sr}_{sc}_{level}" strings 4M np.char.adds would build
    base_keys = np.where(hot, (lv << 16) | (sr << 8) | sc, -1)
    keys.append(base_keys)
    owned.append(np.ones(len(t), dtype=bool))
    take.append(np.arange(len(t), dtype=np.int64))

    # halo replicas: neighbors of hot-tile sub-cells within halo_m
    for dr in (-1, 0, 1):
        for dcol in (-1, 0, 1):
            if dr == 0 and dcol == 0:
                continue
            nr = sr + dr
            nc = sc + dcol
            valid = hot & (nr >= 0) & (nr < n_sub) & (nc >= 0) & (nc < n_sub)
            if not valid.any():
                continue
            # halo replication: distance from the point to the
            # neighbor window along each shifted axis must be < halo_m
            near = valid.copy()
            if dr == -1:
                near &= rel_y - wy0 < halo_m
            elif dr == 1:
                near &= wy1 - rel_y < halo_m
            if dcol == -1:
                near &= rel_x - wx0 < halo_m
            elif dcol == 1:
                near &= wx1 - rel_x < halo_m
            idx = np.flatnonzero(near)
            if len(idx) == 0:
                continue
            keys.append((lv[idx] << 16) | (nr[idx] << 8) | nc[idx])
            owned.append(np.zeros(len(idx), dtype=bool))
            take.append(idx)

    all_idx = np.concatenate(take)
    out = t.take(pa.array(all_idx))
    return out.append_column(
        "salt_sub", pa.array(np.concatenate(keys), pa.int64())
    ).append_column("owned", pa.array(np.concatenate(owned)))


STRICT_L_EPS = 1e-6  # barycentric margin for "strictly interior"
HULL_MARGIN = 1e-6  # meters outside the tile hull for a certified NaN


def _window_pending(tri, out_tri, wbounds, level, sr, sc, hull, halo_m) -> int:
    """Count the window cells whose halo-TIN value is NOT certified
    exact. Certificates (sufficient conditions for bit-equality with
    the full-tile TIN):

    - written cell: its corner is STRICTLY interior (barycentric
      margin) to the winning triangle AND that triangle's circumdisk
      stays inside the halo-covered rectangle (clipped sides at the
      tile border are unconstrained — no points exist beyond). By the
      Delaunay empty-circumdisk property the triangle then belongs to
      the full TIN too, and a strictly-interior corner has a unique
      containing triangle, so both the last-wins rasterizer and the
      first-wins gap-fill query pick it in either TIN.
    - NaN cell: its corner is strictly outside the full tile's convex
      hull (shipped in via the ``tile_hulls`` pre-pass), so the full
      TIN misses it too.

    Anything else is pending; the caller falls back to the build-once
    exact path for tiles with pending cells."""
    from ..geom.hull import strictly_outside_hull

    n_sub = 1 << level
    c0, c1 = _win_bound(sc, n_sub), _win_bound(sc + 1, n_sub)
    r0, r1 = _win_bound(sr, n_sub), _win_bound(sr + 1, n_sub)
    ch_, cw_ = out_tri.shape
    rr, cc = np.meshgrid(np.arange(ch_), np.arange(cw_), indexing="ij")
    px = wbounds.min_x + cc.ravel() * wbounds.cell_width
    py = wbounds.min_y + rr.ravel() * wbounds.cell_height
    tid = out_tri.ravel()
    pending = np.zeros(tid.shape, dtype=bool)

    miss = tid < 0
    if miss.any():
        if hull is None or len(hull) < 3:
            pending[miss] = True
        else:
            pending[miss] = ~strictly_outside_hull(
                hull, px[miss], py[miss], HULL_MARGIN
            )

    hit = ~miss
    if hit.any():
        if tri is None:
            pending[hit] = True
            return int(pending.sum())
        t = tri._tris[tid[hit]]
        x, y = tri._x, tri._y
        # window-local coordinates condition the circumcenter math
        ox_, oy_ = wbounds.min_x, wbounds.min_y
        ax, ay = x[t[:, 0]] - ox_, y[t[:, 0]] - oy_
        bx, by = x[t[:, 1]] - ox_, y[t[:, 1]] - oy_
        cx, cy = x[t[:, 2]] - ox_, y[t[:, 2]] - oy_
        qx, qy = px[hit] - ox_, py[hit] - oy_

        det = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        l1 = ((by - cy) * (qx - cx) + (cx - bx) * (qy - cy)) / det
        l2 = ((cy - ay) * (qx - cx) + (ax - cx) * (qy - cy)) / det
        l3 = 1.0 - l1 - l2
        strict = np.minimum(np.minimum(l1, l2), l3) > STRICT_L_EPS

        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        a2 = ax * ax + ay * ay
        b2 = bx * bx + by * by
        c2 = cx * cx + cy * cy
        with np.errstate(divide="ignore", invalid="ignore"):
            ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
            uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
        rad = np.hypot(ux - ax, uy - ay)

        wx1 = (c1 - c0) * CELL_SIZE_M
        wy1 = (r1 - r0) * CELL_SIZE_M
        covered = np.isfinite(ux) & np.isfinite(uy)
        # effective coverage per side: halo_m capped by the 1-ring
        # neighbor's extent (only the adjacent window replicates in)
        if c0 > 0:
            cov = min(halo_m, (c0 - _win_bound(sc - 1, n_sub)) * CELL_SIZE_M)
            covered &= ux - rad >= -cov
        if c1 < CELLS_PER_EDGE:
            cov = min(halo_m, (_win_bound(sc + 2, n_sub) - c1) * CELL_SIZE_M)
            covered &= ux + rad <= wx1 + cov
        if r0 > 0:
            cov = min(halo_m, (r0 - _win_bound(sr - 1, n_sub)) * CELL_SIZE_M)
            covered &= uy - rad >= -cov
        if r1 < CELLS_PER_EDGE:
            cov = min(halo_m, (_win_bound(sr + 2, n_sub) - r1) * CELL_SIZE_M)
            covered &= uy + rad <= wy1 + cov

        pending[np.flatnonzero(hit)[~(strict & covered)]] = True
    return int(pending.sum())


def halo_pass(src_ds, levels, hulls, halo_m, certify):
    """One salted-window pass: replicate points into (tile, window)
    groups with a halo margin, TIN + rasterize each window, merge the
    disjoint windows per tile. Module-level so the halo-doubling loop
    and its tests drive single rounds directly."""
    salted = src_ds.map_batches(
        lambda t, lv=levels, h=halo_m: _salt_batch(t, lv, h),
        batch_format="pyarrow",
    )
    windows = salted.groupby(["tile_id", "salt_sub"]).map_groups(
        lambda g, h=halo_m, cert=certify: rasterize_salted(
            g, halo_m=h, hulls=hulls, certify=cert
        ),
        batch_format="pandas",
    )
    return windows.groupby("tile_id").map_groups(
        merge_tile_windows, batch_format="pandas"
    )


def rasterize_salted(
    group: pd.DataFrame,
    halo_m: float = HALO_M,
    hulls: dict | None = None,
    certify: bool = False,
) -> pd.DataFrame:
    """Per-salt-key TIN + rasterize into the owned window only.

    Emits a window row ``{tile_id, r_off, c_off, n_h, n_w, dem_win,
    cls_win, counters...}``; unsalted (cold) tiles emit their full
    tile as one window. With ``certify=True`` each row also carries
    ``n_pending`` — the count of cells whose value the per-cell
    Delaunay-locality certificate could NOT prove exact (see
    ``_window_pending``); cold tiles are exact by construction."""
    tile_id = group["tile_id"].iloc[0]
    sub = int(group["salt_sub"].iloc[0])
    if sub >= 0:
        level, sr, sc = (sub >> 16) & 0xFF, (sub >> 8) & 0xFF, sub & 0xFF
    else:
        sr, sc, level = 0, 0, 0

    env = decode(tile_id)
    n_sub = 1 << level
    c0, c1 = _win_bound(sc, n_sub), _win_bound(sc + 1, n_sub)
    r0, r1 = _win_bound(sr, n_sub), _win_bound(sr + 1, n_sub)
    cells_w = c1 - c0
    cells_h = r1 - r0
    wenv = (
        env[0] + c0 * CELL_SIZE_M,
        env[1] + r0 * CELL_SIZE_M,
        env[0] + c1 * CELL_SIZE_M,
        env[1] + r1 * CELL_SIZE_M,
    )
    wbounds = RasterBounds.for_tile(wenv, CELL_SIZE_M)
    tile_bounds = RasterBounds.for_tile(env, CELL_SIZE_M)

    own = group["owned"].to_numpy()
    x = group["x"].to_numpy()
    y = group["y"].to_numpy()
    z = group["z"].to_numpy()
    cls = group["classification"].to_numpy()
    is_ground = group["is_ground"].to_numpy()

    # voxel/DEM state from owned points only (they lie in the window)
    tile = vx.build_voxel_tile(
        wbounds, x[own], y[own], z[own], cls[own], is_ground[own]
    )

    n_triangles = 0
    missing_before = missing_after = -1
    dem = np.full((cells_h, cells_w), np.nan, dtype=np.float32)
    cls_raster = np.zeros((cells_h, cells_w), dtype=np.uint8)
    out_tri = np.full((cells_h, cells_w), -1, dtype=np.int32) if certify else None

    tri = None
    if len(x) >= 3:
        tri = SurfaceTriangulation(tile_bounds)
        tri.set_points(x, y, z, cls)  # owned + halo support
        try:
            tri.create()
            n_triangles = tri.triangle_count()
        except ValueError:
            tri = None
            n_triangles = 0
        if n_triangles:
            tri.rasterise_dem(
                wbounds, dem, classification_raster=cls_raster, out_tri=out_tri
            )
            # gap fill only NaN voxel-DEM cells inside the window
            missing_before, missing_after = vx.fill_missing_from_tin(
                tile, tri, int(wenv[0]), int(wenv[1]), int(wenv[2]), int(wenv[3])
            )

    out = {
        "tile_id": [tile_id],
        "r_off": [r0],
        "c_off": [c0],
        "n_h": [cells_h],
        "n_w": [cells_w],
        "n_points": [int(own.sum())],
        "n_ground": [int(is_ground[own].sum())],
        "n_triangles": [n_triangles],
        "missing_before": [missing_before],
        "missing_after": [missing_after],
        "n_voxel_cells": [int((np.diff(tile.bin_starts) > 0).sum())],
        "tin_dem_win": [dem.tobytes()],
        "cls_win": [cls_raster.tobytes()],
    }
    if certify:
        if sub < 0:
            n_pending = 0  # cold tile: full-tile TIN, exact by construction
        else:
            n_pending = _window_pending(
                tri if n_triangles else None,
                out_tri,
                wbounds,
                level,
                sr,
                sc,
                (hulls or {}).get(tile_id),
                halo_m,
            )
        out["n_pending"] = [n_pending]
    return pd.DataFrame(out)


def merge_tile_windows(group: pd.DataFrame) -> pd.DataFrame:
    """Paste disjoint sub-cell windows into the full-tile raster
    (LockedCells merge: windows never overlap)."""
    tile_id = group["tile_id"].iloc[0]
    n = CELLS_PER_EDGE
    dem = np.full((n, n), np.nan, dtype=np.float32)
    cls_raster = np.zeros((n, n), dtype=np.uint8)
    for _, r in group.iterrows():
        h, w = int(r["n_h"]), int(r["n_w"])
        r0, c0 = int(r["r_off"]), int(r["c_off"])
        dem[r0 : r0 + h, c0 : c0 + w] = np.frombuffer(
            r["tin_dem_win"], dtype=np.float32
        ).reshape(h, w)
        cls_raster[r0 : r0 + h, c0 : c0 + w] = np.frombuffer(
            r["cls_win"], dtype=np.uint8
        ).reshape(h, w)
    mb = group["missing_before"].to_numpy()
    ma = group["missing_after"].to_numpy()
    out = {
        "tile_id": [tile_id],
        "n_points": [int(group["n_points"].sum())],
        "n_ground": [int(group["n_ground"].sum())],
        "n_triangles": [int(group["n_triangles"].sum())],
        "n_dem_cells": [int((~np.isnan(dem)).sum())],
        "missing_before": [int(mb[mb >= 0].sum()) if (mb >= 0).any() else -1],
        "missing_after": [int(ma[ma >= 0].sum()) if (ma >= 0).any() else -1],
        "n_voxel_cells": [int(group["n_voxel_cells"].sum())],
        "dem": [dem.tobytes()],
        "classification_raster": [cls_raster.tobytes()],
    }
    if "n_pending" in group.columns:
        out["n_pending"] = [int(group["n_pending"].sum())]
    return pd.DataFrame(out)


# --------------------------------- exact mode: build once, split raster


def _finished_tile_window(full: pd.DataFrame, tile_id: str, n_rows: int,
                          n_cols: int) -> pd.DataFrame:
    """Wrap a finished ``rasterize_tile`` row as one full-tile window
    row (win_sr = -1 marks it final: ``_window_batch`` passes it
    through and the merge reconstitutes it unchanged)."""
    return pd.DataFrame(
        {
            "tile_id": [tile_id],
            "r_off": [0],
            "c_off": [0],
            "n_h": [n_rows],
            "n_w": [n_cols],
            "n_points": [int(full["n_points"].iloc[0])],
            "n_ground": [int(full["n_ground"].iloc[0])],
            "n_triangles": [int(full["n_triangles"].iloc[0])],
            "missing_before": [int(full["missing_before"].iloc[0])],
            "missing_after": [int(full["missing_after"].iloc[0])],
            "n_voxel_cells": [int(full["n_voxel_cells"].iloc[0])],
            "tin_dem_win": [full["dem"].iloc[0]],
            "cls_win": [full["classification_raster"].iloc[0]],
            "blob_pts": [b""],
            "blob_tris": [b""],
            "blob_index": [b""],
            "win_sr": [-1],
            "win_sc": [-1],
            "win_level": [0],
        }
    )


def _pack_pts(x, y, z, cls, is_ground) -> bytes:
    return b"".join(
        (
            x.astype("<f8").tobytes(),
            y.astype("<f8").tobytes(),
            z.astype("<f8").tobytes(),
            cls.astype(np.uint8).tobytes(),
            is_ground.astype(np.uint8).tobytes(),
        )
    )


def _unpack_pts(blob: bytes):
    n = len(blob) // (8 * 3 + 2)
    o = 0
    x = np.frombuffer(blob, dtype="<f8", count=n, offset=o); o += 8 * n
    y = np.frombuffer(blob, dtype="<f8", count=n, offset=o); o += 8 * n
    z = np.frombuffer(blob, dtype="<f8", count=n, offset=o); o += 8 * n
    cls = np.frombuffer(blob, dtype=np.uint8, count=n, offset=o); o += n
    is_ground = np.frombuffer(blob, dtype=np.uint8, count=n, offset=o).astype(bool)
    return x, y, z, cls, is_ground


def _build_hot_tile(group: pd.DataFrame, level: int) -> pd.DataFrame:
    """One task per hot tile: build the FULL tile's Delaunay TIN (and
    its grid index) exactly as ``tin.rasterize_tile`` would — same
    point order, same Delaunator output, same tri ids — then fan out
    one row per raster window carrying the serialized TIN. The window
    tasks rasterize + gap-fill their disjoint window only, so the hot
    tile pays ONE build (round 1's replicate-build paid n_windows)
    and output is bit-identical to the unsalted path by construction."""
    from .tin import rasterize_tile

    tile_id = group["tile_id"].iloc[0]
    env = decode(tile_id)
    tile_bounds = RasterBounds.for_tile(env, CELL_SIZE_M)
    x = group["x"].to_numpy()
    y = group["y"].to_numpy()
    z = group["z"].to_numpy()
    cls = group["classification"].to_numpy()
    is_ground = group["is_ground"].to_numpy()

    tri = None
    if len(x) >= 3:
        tri = SurfaceTriangulation(tile_bounds)
        tri.set_points(x, y, z, cls)
        try:
            tri.create()
        except ValueError:
            tri = None  # collinear — no TIN
    if tri is None or tri.triangle_count() == 0:
        # degenerate hot tile: emit the finished tile as one full
        # window (merge reconstitutes it unchanged)
        return _finished_tile_window(
            rasterize_tile(group), tile_id, tile_bounds.n_rows, tile_bounds.n_cols
        )
    return _fanout_window_rows(tile_id, level, tri, x, y, z, cls, is_ground)


def _fanout_window_rows(
    tile_id: str, level: int, tri: SurfaceTriangulation, x, y, z, cls, is_ground
) -> pd.DataFrame:
    """Serialize a built full-tile TIN into one row per raster window
    (the rasterize-split fanout shared by the build-once and the
    distributed strip-merge paths)."""
    n_tri = tri.triangle_count()
    blob_pts = _pack_pts(x, y, z, cls, is_ground)
    blob_tris = tri._tris.astype("<i4").tobytes()
    blob_index = (
        tri._cell_starts.astype("<i8").tobytes()
        + tri._cell_tris.astype("<i4").tobytes()
    )

    n_sub = 1 << level
    rows = {k: [] for k in (
        "tile_id", "r_off", "c_off", "n_h", "n_w", "n_points", "n_ground",
        "n_triangles", "missing_before", "missing_after", "n_voxel_cells",
        "tin_dem_win", "cls_win", "blob_pts", "blob_tris", "blob_index",
        "win_sr", "win_sc", "win_level",
    )}
    for sr in range(n_sub):
        for sc in range(n_sub):
            rows["tile_id"].append(tile_id)
            rows["r_off"].append(-1)
            rows["c_off"].append(-1)
            rows["n_h"].append(-1)
            rows["n_w"].append(-1)
            rows["n_points"].append(0)
            rows["n_ground"].append(0)
            # full count rides on window (0,0) so the merge SUM is the
            # exact unsalted n_triangles
            rows["n_triangles"].append(n_tri if (sr == 0 and sc == 0) else 0)
            rows["missing_before"].append(-1)
            rows["missing_after"].append(-1)
            rows["n_voxel_cells"].append(0)
            rows["tin_dem_win"].append(b"")
            rows["cls_win"].append(b"")
            rows["blob_pts"].append(blob_pts)
            rows["blob_tris"].append(blob_tris)
            rows["blob_index"].append(blob_index)
            rows["win_sr"].append(sr)
            rows["win_sc"].append(sc)
            rows["win_level"].append(level)
    return pd.DataFrame(rows)


def _rasterize_prebuilt_window(row: dict) -> dict:
    """Window task of the build-once path: re-hydrate the tile TIN
    from blobs, rasterize + gap-fill this window only."""
    tile_id = row["tile_id"]
    level = int(row["win_level"])
    sr, sc = int(row["win_sr"]), int(row["win_sc"])
    env = decode(tile_id)
    tile_bounds = RasterBounds.for_tile(env, CELL_SIZE_M)

    x, y, z, cls, is_ground = _unpack_pts(row["blob_pts"])

    tris = np.frombuffer(row["blob_tris"], dtype="<i4").reshape(-1, 3)
    idx_blob = row["blob_index"]
    n_cells = tile_bounds.n_rows * tile_bounds.n_cols
    cell_starts = np.frombuffer(idx_blob, dtype="<i8", count=n_cells + 1)
    cell_tris = np.frombuffer(idx_blob, dtype="<i4", offset=8 * (n_cells + 1))

    tri = SurfaceTriangulation(tile_bounds)
    tri.set_points(x, y, z, cls)
    tri.set_triangulation(tris, cell_starts, cell_tris)

    n_sub = 1 << level
    c0, c1 = _win_bound(sc, n_sub), _win_bound(sc + 1, n_sub)
    r0, r1 = _win_bound(sr, n_sub), _win_bound(sr + 1, n_sub)
    wenv = (
        env[0] + c0 * CELL_SIZE_M,
        env[1] + r0 * CELL_SIZE_M,
        env[0] + c1 * CELL_SIZE_M,
        env[1] + r1 * CELL_SIZE_M,
    )
    wbounds = RasterBounds.for_tile(wenv, CELL_SIZE_M)

    own = (x >= wenv[0]) & (x < wenv[2]) & (y >= wenv[1]) & (y < wenv[3])
    tile = vx.build_voxel_tile(wbounds, x[own], y[own], z[own], cls[own], is_ground[own])

    dem = np.full((r1 - r0, c1 - c0), np.nan, dtype=np.float32)
    cls_raster = np.zeros((r1 - r0, c1 - c0), dtype=np.uint8)
    tri.rasterise_dem(wbounds, dem, classification_raster=cls_raster)
    missing_before, missing_after = vx.fill_missing_from_tin(
        tile, tri, int(wenv[0]), int(wenv[1]), int(wenv[2]), int(wenv[3])
    )
    return {
        "tile_id": tile_id,
        "r_off": r0,
        "c_off": c0,
        "n_h": r1 - r0,
        "n_w": c1 - c0,
        "n_points": int(own.sum()),
        "n_ground": int(is_ground[own].sum()),
        "n_triangles": int(row["n_triangles"]),
        "missing_before": missing_before,
        "missing_after": missing_after,
        "n_voxel_cells": int((np.diff(tile.bin_starts) > 0).sum()),
        "tin_dem_win": dem.tobytes(),
        "cls_win": cls_raster.tobytes(),
    }


def _window_batch(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for _, row in df.iterrows():
        if int(row["win_sr"]) < 0:  # degenerate tile, already final
            out.append({k: row[k] for k in (
                "tile_id", "r_off", "c_off", "n_h", "n_w", "n_points",
                "n_ground", "n_triangles", "missing_before", "missing_after",
                "n_voxel_cells", "tin_dem_win", "cls_win",
            )})
        else:
            out.append(_rasterize_prebuilt_window(row))
    return pd.DataFrame(out)


# ------------------------- exact mode: distributed strip-merge build


N_BUILD_STRIPS = 8
MIN_STRIP_POINTS = 16


def _hot_tile_strip_rows(g: pd.DataFrame, level: int, n_strips: int) -> pd.DataFrame:
    """Split a hot tile's points into x-strips for the distributed
    merge build: one row per nonempty strip carrying that strip's
    packed points (win_sr = -2 marks a strip row; win_sc = strip id).
    Falls back to the single-task build when the x distribution is so
    skewed that halving cannot give every nonempty strip
    ``MIN_STRIP_POINTS`` points."""
    from ..geom.dc_merge import strip_assign

    x = g["x"].to_numpy()
    while n_strips > 1:
        strip = strip_assign(x, n_strips)
        counts = np.bincount(strip, minlength=n_strips)
        if counts[counts > 0].min() >= MIN_STRIP_POINTS:
            break
        n_strips //= 2
    else:
        return _build_hot_tile(g, level)

    tile_id = g["tile_id"].iloc[0]
    y = g["y"].to_numpy()
    z = g["z"].to_numpy()
    cls = g["classification"].to_numpy()
    is_ground = g["is_ground"].to_numpy()
    rows = []
    for s in range(n_strips):
        m = strip == s
        if not m.any():
            continue
        rows.append(
            {
                "tile_id": tile_id,
                "r_off": -1,
                "c_off": -1,
                "n_h": -1,
                "n_w": -1,
                "n_points": 0,
                "n_ground": 0,
                "n_triangles": 0,
                "missing_before": -1,
                "missing_after": -1,
                "n_voxel_cells": 0,
                "tin_dem_win": b"",
                "cls_win": b"",
                "blob_pts": _pack_pts(x[m], y[m], z[m], cls[m], is_ground[m]),
                "blob_tris": b"",
                "blob_index": b"",
                "win_sr": -2,
                "win_sc": s,
                "win_level": level,
            }
        )
    return pd.DataFrame(rows)


def _strip_build_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Triangulate one strip (the parallel O(n log n) part of the
    distributed build). Non-strip rows pass through untouched.
    Degenerate strips (collinear) keep empty blobs — the merge task
    falls back to a single full build for that tile."""
    from ..geom.dc_merge import build_strip

    if int(df["win_sr"].iloc[0]) != -2:
        return df
    row = df.iloc[0]
    x, y, *_ = _unpack_pts(row["blob_pts"])
    tris, hull = build_strip(x, y, np.arange(len(x), dtype=np.int64))
    if tris is None:
        return df
    return df.assign(
        blob_tris=[tris.astype("<i4").tobytes()],
        blob_index=[hull.astype("<i4").tobytes()],
    )


def _merge_tile_tris(parts):
    """Seam-merge built strips (list of (x, y, z, cls, is_ground,
    tris_local, hull_local) per strip, left-to-right). Returns the
    concatenated point arrays plus the merged triangle array, or
    ``None`` for the triangles when any strip is degenerate or the
    merge cannot certify exactness (Euler check) — callers then run
    the single-task full build over the returned points."""
    from ..geom.dc_merge import MergeError, merge_parts

    xs = np.concatenate([p[0] for p in parts])
    ys = np.concatenate([p[1] for p in parts])
    zs = np.concatenate([p[2] for p in parts])
    cs = np.concatenate([p[3] for p in parts])
    igs = np.concatenate([p[4] for p in parts])
    part_tris, part_hulls = [], []
    off = 0
    degenerate = False
    for p in parts:
        if p[5] is None:
            degenerate = True
        else:
            part_tris.append(p[5] + off)
            part_hulls.append(p[6] + off)
        off += len(p[0])
    tris = None
    if not degenerate and part_tris:
        try:
            tris = merge_parts(xs, ys, part_tris, part_hulls)
        except MergeError:
            tris = None
    return xs, ys, zs, cs, igs, tris


def _merge_built_strips(group: pd.DataFrame) -> pd.DataFrame:
    """Per-tile merge task of the distributed build: seam-merge the
    strip triangulations into the tile's full Delaunay TIN, build the
    grid index (vectorized), and fan out the rasterize-split window
    rows. Cold tiles' finished rows pass through untouched."""
    from .tin import rasterize_tile

    if int(group["win_sr"].iloc[0]) != -2:
        return group
    tile_id = group["tile_id"].iloc[0]
    level = int(group["win_level"].iloc[0])
    g = group.sort_values("win_sc")
    parts = []
    for _, r in g.iterrows():
        x, y, z, cls, ig = _unpack_pts(r["blob_pts"])
        if len(r["blob_tris"]):
            tris = np.frombuffer(r["blob_tris"], dtype="<i4").astype(np.int64).reshape(-1, 3)
            hull = np.frombuffer(r["blob_index"], dtype="<i4").astype(np.int64)
        else:
            tris = hull = None
        parts.append((x, y, z, cls, ig, tris, hull))
    x, y, z, cls, is_ground, tris = _merge_tile_tris(parts)

    env = decode(tile_id)
    tile_bounds = RasterBounds.for_tile(env, CELL_SIZE_M)
    tri = SurfaceTriangulation(tile_bounds)
    tri.set_points(x, y, z, cls)
    if tris is not None:
        tri.set_triangulation(tris)
    else:
        try:
            tri.create()
        except ValueError:
            tri = None  # collinear — no TIN
    if tri is None or tri.triangle_count() == 0:
        df = pd.DataFrame(
            {
                "tile_id": tile_id,
                "x": x,
                "y": y,
                "z": z,
                "classification": cls,
                "is_ground": is_ground,
            }
        )
        return _finished_tile_window(
            rasterize_tile(df), tile_id, tile_bounds.n_rows, tile_bounds.n_cols
        )
    return _fanout_window_rows(tile_id, level, tri, x, y, z, cls, is_ground)


def salted_tin_tiles(
    points_ds,
    threshold: int = HOT_THRESHOLD,
    halo_m: float = HALO_M,
    include_rasters: bool = True,
    exact: bool = True,
    exact_level: int = 1,
    certify: bool = True,
    key_col: str = "tile_id",
    build: str = "merge",
    n_strips: int = N_BUILD_STRIPS,
):
    """Skew-aware variant of ``stages.tin.tin_tiles``.

    - ``exact=True`` (default): the hot tile's raster work is split
      into ``(2**exact_level)**2`` disjoint windows; the BUILD is
      controlled by ``build``:

      * ``build="merge"`` (default): **distributed strip-merge** —
        ``n_strips`` tasks each triangulate one x-strip of the hot
        tile in parallel, a per-tile merge task seam-merges them into
        the full Delaunay TIN (``geom.dc_merge``, Guibas–Stolfi
        rising bridge) and fans out the window rows. No single task
        ever runs the full-tile O(n log n) build; the merge task's
        python work is proportional to the seams. The Delaunay of
        points in general position is unique, so the triangle set —
        and therefore the rasters and ``n_triangles`` — equal the
        single-build output (pinned by tests); degenerate strips or a
        failed Euler certification fall back to a single full build
        inside the merge task.
      * ``build="once"``: **build once, rasterize split** — one task
        per hot tile builds the full-tile TIN, window tasks
        rasterize/gap-fill disjoint windows of it. Bit-identical to
        the unsalted path by construction (same TIN, same tri ids);
        wall of the straggler = one full build + 1/n_windows of the
        raster work.
    - ``exact=False``: halo mode, the extreme-skew path — split level
      grows with density and BUILD cost is divided too. With
      ``certify=True`` (default) every cell is checked against the
      per-cell Delaunay-locality certificate (``_window_pending``) and
      tiles with any uncertified cell are recomputed through the
      build-once path, so the OUTPUT is exact — the halo TIN only ever
      serves values it can prove. ``certify=False`` keeps round 1's
      raw approximate behavior (bounded sliver deviation near window
      borders, tests bound it < 0.5% of cells).

    Falls back to plain per-tile processing when nothing is hot.

    ``points_ds`` is consumed ONCE in exact mode (the hot decision is
    len(group) inside the dispatch task — no count pre-pass) and up to
    four times in certified halo mode (count + hull pass + salted scan
    + pending recompute): for halo mode feed it a checkpointed /
    parquet-backed dataset (projection pushdown makes the count pass a
    one-column read), not an expensive synthetic pipeline."""
    from .cogroup import group_apply_bucketed
    from .tin import tin_tiles

    if exact:
        # NO count pre-pass: the dispatch group already holds the
        # whole tile, so "hot" is just len(group) — one scan + one
        # coarse-bucket shuffle instead of a tile_id-column scan +
        # aggregate followed by the tile shuffle. A hot tile's group
        # builds the TIN once and fans out window rows; a cold tile
        # rasterizes in place and emits one finished full-tile window
        # that rides the (cheap, row-per-tile) merge exchange through.
        from .tin import rasterize_tile as _rt

        def dispatch(g: pd.DataFrame) -> pd.DataFrame:
            if key_col != "tile_id":
                # int64 tile key rode the shuffle (strings cost
                # seconds per million rows there); reconstruct the
                # user-facing name once per GROUP
                from .tiling import tile_key_to_name

                g = g.assign(tile_id=tile_key_to_name(g[key_col].iloc[0]))
                g = g.drop(columns=[key_col])
            tile_id = g["tile_id"].iloc[0]
            if len(g) > threshold:
                if build == "merge":
                    return _hot_tile_strip_rows(g, exact_level, n_strips)
                return _build_hot_tile(g, exact_level)
            env = decode(tile_id)
            tb = RasterBounds.for_tile(env, CELL_SIZE_M)
            return _finished_tile_window(_rt(g), tile_id, tb.n_rows, tb.n_cols)

        staged = group_apply_bucketed(points_ds, key_col, dispatch)
        if build == "merge":
            # distributed build: strip triangulations in parallel
            # tasks, one cheap seam-merge task per hot tile — no
            # single task ever runs the full-tile O(n log n) build
            staged = group_apply_bucketed(
                staged.map_batches(
                    _strip_build_batch, batch_format="pandas", batch_size=1
                ),
                "tile_id",
                _merge_built_strips,
            )
        out = group_apply_bucketed(
            staged.map_batches(_window_batch, batch_format="pandas", batch_size=1),
            "tile_id",
            merge_tile_windows,
        )
        if not include_rasters:
            out = out.drop_columns(["dem", "classification_raster"])
        return out

    # certified-halo mode still needs the count pre-pass: the split
    # LEVEL (window fanout) depends on the tile's density before any
    # group materializes
    counts = tile_count_partials(points_ds)
    levels = salt_levels(counts, threshold, exact=exact)
    if not levels:
        return tin_tiles(points_ds, include_rasters=include_rasters)

    if True:  # halo mode (kept indented to preserve the diff's shape)
        hulls = tile_hulls(points_ds, levels) if certify else {}
        out = halo_pass(points_ds, levels, hulls, halo_m, certify)
        if certify:
            out = out.materialize()

            def pending_of(ds):
                return sorted(
                    r["tile_id"]
                    for r in ds.map_batches(
                        lambda t: t.select(["tile_id", "n_pending"]),
                        batch_format="pyarrow",
                    ).take_all()
                    if r["n_pending"] > 0
                )

            def in_set(t: pa.Table, arr, invert=False) -> pa.Table:
                ids = t.column("tile_id").to_numpy(zero_copy_only=False)
                mask = pd.Index(ids).isin(arr)
                return t.filter(pa.array(~mask if invert else mask))

            # HALO DOUBLING: uncertified tiles (hull slivers, wide
            # circumdisks) re-run the SAME split with a doubled halo —
            # each round certifies strictly more cells, the builds stay
            # window-local (no single task ever holds the whole hot
            # tile), and for real point distributions one doubling
            # resolves nearly everything. The build-once path is only
            # the terminal fallback when doubling would exceed the
            # tile (pathological: certificates keep failing at
            # halo ~ tile scale).
            pend = pending_of(out)
            halo_r = halo_m
            while pend and halo_r * 2 <= TILE_SIZE_M / 2:
                halo_r *= 2
                pend_arr = np.sort(np.array(pend, dtype=object))
                sub_levels = {t: levels[t] for t in pend if t in levels}
                redo = halo_pass(
                    points_ds.map_batches(
                        lambda t, a=pend_arr: in_set(t, a), batch_format="pyarrow"
                    ),
                    sub_levels,
                    hulls,
                    halo_r,
                    True,
                ).materialize()
                out = (
                    out.map_batches(
                        lambda t, a=pend_arr: in_set(t, a, invert=True),
                        batch_format="pyarrow",
                    )
                    .union(redo)
                    .materialize()
                )
                new_pend = pending_of(redo)
                if set(new_pend) == set(pend):
                    # non-improving round: these tiles carry
                    # tile-spanning circumdisks (border slivers) that
                    # no local halo can certify — stop doubling, let
                    # the terminal build-once fallback take them
                    pend = new_pend
                    break
                pend = new_pend

            pend_arr = np.sort(np.array(pend, dtype=object))

            def drop_pending(t: pa.Table, keep_rows: bool) -> pa.Table:
                t = t.drop_columns(["n_pending"])
                if not keep_rows:
                    return in_set(t, pend_arr, invert=True)
                return t

            ok = out.map_batches(
                lambda t: drop_pending(t, keep_rows=not pend),
                batch_format="pyarrow",
            )
            if pend:
                fixed = (
                    points_ds.map_batches(
                        lambda t, a=pend_arr: in_set(t, a), batch_format="pyarrow"
                    )
                    .groupby("tile_id")
                    .map_groups(
                        lambda g: _build_hot_tile(g, 1), batch_format="pandas"
                    )
                    .map_batches(_window_batch, batch_format="pandas", batch_size=1)
                    .groupby("tile_id")
                    .map_groups(merge_tile_windows, batch_format="pandas")
                )
                out = ok.union(fixed)
            else:
                out = ok
    if not include_rasters:
        out = out.drop_columns(["dem", "classification_raster"])
    return out
