"""S2-cell tiling over the web-page corpus (the north rule's "H3/S2
index" component).

Each document is mapped to a deterministic direction on the unit
sphere (three hash-derived components — unnormalized on purpose: the
S2 face/uv projection only uses component ratios, which keeps every
float op IEEE-identical between numpy and the DuckDB oracle, see
``geom/s2.py``), keyed by its S2 cell at a chosen level, and counted
per cell with an ordinary groupby-aggregate shuffle — the spherical
generalization of the engine's km-grid ``tile_counts``
(``Nls/TileNamer.cs`` role in the reference).

100 TB shape: the cell id is ONE int64 shuffle key; counts are
Ray-Data partial-aggregated per block before the exchange, so the
all-to-all carries one row per (block, cell). The parent rollup is
pure bit arithmetic on the already-aggregated table (no second pass
over the corpus) — the point of the S2 hierarchy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..corpus.geocode import H1_MUL, H2_MUL, H2_ADD, M32, hashes
from ..geom import s2

CELL_LEVEL = 5
ROLLUP_LEVEL = 2


def directions_of(doc_id: np.ndarray):
    """doc_id -> deterministic unnormalized direction in [-1,1]^3."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    h1, h2 = hashes(doc_id)
    h3 = (h1 * 31 + h2) % M32
    dx = (h1 % 2000001) / 1e6 - 1.0
    dy = (h2 % 2000001) / 1e6 - 1.0
    dz = (h3 % 2000001) / 1e6 - 1.0
    return dx, dy, dz


def add_s2_columns(batch: pa.Table, level: int = CELL_LEVEL) -> pa.Table:
    """Append cell_id (uint64 id reinterpreted as int64) + face."""
    doc_id = batch.column("doc_id").to_numpy()
    dx, dy, dz = directions_of(doc_id)
    cell = s2.xyz_to_cell(dx, dy, dz, level)
    return batch.append_column(
        "cell_id", pa.array(cell.view(np.int64), pa.int64())
    ).append_column("face", pa.array(s2.face_of(cell), pa.int64()))


def s2_cell_counts(ds, level: int = CELL_LEVEL):
    """documents -> (cell_id, face, n_docs) at ``level``."""
    from ray.data.aggregate import Count

    return (
        ds.select_columns(["doc_id"])
        .map_batches(lambda t: add_s2_columns(t, level), batch_format="pyarrow")
        .groupby(["cell_id", "face"])
        .aggregate(Count(alias_name="n_docs"))
    )


def s2_parent_rollup(ds, level: int = CELL_LEVEL, parent_level: int = ROLLUP_LEVEL):
    """Cell counts rolled up the hierarchy: aggregate the LEVEL table
    (not the corpus) by each cell's ``parent_level`` ancestor."""
    from ray.data.aggregate import Sum

    def to_parent(t: pa.Table) -> pa.Table:
        cell = t.column("cell_id").to_numpy().view(np.uint64)
        par = s2.parent(cell, parent_level)
        return pa.table(
            {
                "parent_id": pa.array(par.view(np.int64), pa.int64()),
                "face": t.column("face"),
                "n_docs": t.column("n_docs"),
            }
        )

    return (
        s2_cell_counts(ds, level)
        .map_batches(to_parent, batch_format="pyarrow")
        .groupby(["parent_id", "face"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


REGION_LEVEL = 2
REGION_INDEX = 17  # an arbitrary fixed level-2 region for the query


def region_cell(index: int = REGION_INDEX, level: int = REGION_LEVEL) -> int:
    """The ``index``-th level-``level`` cell in Hilbert id order —
    face = index // 4^level, position = index % 4^level."""
    per_face = 1 << (2 * level)
    face = index // per_face
    pos = index % per_face
    lsb_ = 1 << (2 * (s2.MAX_LEVEL - level))
    return (face << (2 * s2.MAX_LEVEL + 1)) | (pos * 2 * lsb_) | lsb_


def s2_range_select(ds, index: int = REGION_INDEX, level: int = CELL_LEVEL):
    """Docs whose level-``level`` cell lies inside the fixed level-2
    region cell — membership is TWO INTEGER COMPARISONS against the
    region's [range_min, range_max], the pruning primitive a
    100 TB spatial join uses to skip blocks/files (cell-sorted
    parquet + these bounds = row-group pruning at the read)."""
    region = np.uint64(region_cell(index))
    lo = int(s2.range_min(region))
    hi = int(s2.range_max(region))
    lo_s = np.int64(np.uint64(lo))
    hi_s = np.int64(np.uint64(hi))

    def select(t: pa.Table) -> pa.Table:
        t = add_s2_columns(t, level)
        cell = t.column("cell_id").to_numpy()  # signed view
        keep = (cell >= lo_s) & (cell <= hi_s)
        return t.filter(pa.array(keep))

    return ds.select_columns(["doc_id"]).map_batches(select, batch_format="pyarrow")


def s2_range_select_sql(
    index: int = REGION_INDEX, level: int = CELL_LEVEL, src: str = "documents"
) -> str:
    region = np.uint64(region_cell(index))
    lo = int(np.int64(s2.range_min(region)))
    hi = int(np.int64(s2.range_max(region)))
    return (
        f"WITH {_dirs_cte(src)}, {s2.sql_ctes('s2dirs', level=level)} "
        "SELECT doc_id, cell_id, CAST(face AS BIGINT) AS face FROM s2out "
        f"WHERE cell_id BETWEEN {lo} AND {hi}"
    )


# ----------------------------------------------------------- cap join
#
# Filter + refine, the spatial-join pattern the covering exists for:
# each query cap becomes a cell covering (python-side, tiny) whose
# [range_min, range_max] intervals PRUNE each batch by searchsorted
# on the doc's leaf cell id (map-only, no shuffle); survivors take
# the EXACT membership test  dot(d, c) / |d| >= cos(angle)  — no
# acos, so every float op (mul/add/sqrt/div/compare) is IEEE-exact
# and the result is value-exact vs a DuckDB oracle that runs the SAME
# predicate WITHOUT the prune: the oracle equality doubles as proof
# the covering admits no false negatives.

# three fixed query caps (unit centers inlined as literals into SQL)
_CAP_DEFS = (
    (0, (0.3, -0.5, 0.81), 0.30),
    (1, (-0.9, 0.1, 0.2), 0.20),
    (2, (0.0, 1.0, 0.05), 0.45),
)


def query_caps():
    caps = []
    for cap_id, c, ang in _CAP_DEFS:
        v = np.array(c, np.float64)
        v = v / np.sqrt((v * v).sum())
        caps.append((cap_id, v, float(ang), float(np.cos(ang))))
    return caps


def s2_cap_join(ds, max_level: int = 8):
    """documents x caps membership: (cap_id, doc_id, cell_id)."""
    caps = query_caps()
    covers = []
    for cap_id, v, ang, cos_a in caps:
        cov = s2.cap_covering(v, ang, max_level=max_level)
        covers.append((cap_id, v, cos_a, s2.range_min(cov), s2.range_max(cov)))

    def batch(t: pa.Table) -> pa.Table:
        doc_id = t.column("doc_id").to_numpy()
        dx, dy, dz = directions_of(doc_id)
        leaf = s2.xyz_to_cell(dx, dy, dz, s2.MAX_LEVEL)
        norm = np.sqrt(dx * dx + dy * dy + dz * dz)
        out_cap, out_doc, out_cell = [], [], []
        for cap_id, v, cos_a, lo, hi in covers:
            idx = np.searchsorted(lo, leaf, side="right") - 1
            idx = np.clip(idx, 0, len(lo) - 1)
            cand = (leaf >= lo[idx]) & (leaf <= hi[idx])
            if not cand.any():
                continue
            d = dx[cand] * v[0] + dy[cand] * v[1] + dz[cand] * v[2]
            inside = d / norm[cand] >= cos_a
            keep = np.nonzero(cand)[0][inside]
            out_cap.append(np.full(len(keep), cap_id, np.int64))
            out_doc.append(doc_id[keep])
            out_cell.append(leaf[keep].view(np.int64))
        if not out_cap:
            return pa.table(
                {
                    "cap_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "cell_id": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "cap_id": pa.array(np.concatenate(out_cap), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                "cell_id": pa.array(np.concatenate(out_cell), pa.int64()),
            }
        )

    return ds.select_columns(["doc_id"]).map_batches(batch, batch_format="pyarrow")


def s2_cap_join_sql(src: str = "documents") -> str:
    """Full-scan oracle: the exact predicate with NO covering prune —
    equality with the Ray path proves the prune is lossless."""
    arms = []
    for cap_id, v, ang, cos_a in query_caps():
        vx, vy, vz = (float(x) for x in v)
        pred = (
            f"(dx * {vx!r} + dy * {vy!r} + dz * {vz!r}) / "
            f"sqrt(dx * dx + dy * dy + dz * dz) >= {cos_a!r}"
        )
        arms.append(
            f"SELECT CAST({cap_id} AS BIGINT) AS cap_id, doc_id, cell_id "
            f"FROM s2out WHERE {pred}"
        )
    return (
        f"WITH {_dirs_cte(src)}, {s2.sql_ctes('s2dirs', level=s2.MAX_LEVEL)} "
        + " UNION ALL ".join(arms)
    )


# -------------------------------------------------------- SQL mirror


def _dirs_cte(src: str = "documents") -> str:
    h1 = f"((doc_id * {H1_MUL}) % {M32})"
    h2 = f"((doc_id * {H2_MUL} + {H2_ADD}) % {M32})"
    h3 = f"(({h1} * 31 + {h2}) % {M32})"
    return (
        f"s2dirs AS (SELECT doc_id, "
        f"({h1} % 2000001) / 1000000.0 - 1.0 AS dx, "
        f"({h2} % 2000001) / 1000000.0 - 1.0 AS dy, "
        f"({h3} % 2000001) / 1000000.0 - 1.0 AS dz FROM {src})"
    )


def s2_cell_counts_sql(level: int = CELL_LEVEL, src: str = "documents") -> str:
    return (
        f"WITH {_dirs_cte(src)}, {s2.sql_ctes('s2dirs', level=level)} "
        "SELECT cell_id, CAST(face AS BIGINT) AS face, count(*) AS n_docs "
        "FROM s2out GROUP BY 1, 2"
    )


def s2_parent_rollup_sql(
    level: int = CELL_LEVEL, parent_level: int = ROLLUP_LEVEL, src: str = "documents"
) -> str:
    step = 2 << (2 * (s2.MAX_LEVEL - parent_level))
    half = step // 2
    parent_u = f"(cell_u // {step}) * {step} + {half}"
    return (
        f"WITH {_dirs_cte(src)}, {s2.sql_ctes('s2dirs', level=level)}, "
        f"lvl AS (SELECT cell_u, CAST(face AS BIGINT) AS face, count(*) AS n "
        "FROM s2out GROUP BY 1, 2) "
        f"SELECT CASE WHEN {parent_u} >= {1 << 63} "
        f"THEN CAST({parent_u} - {1 << 64} AS BIGINT) "
        f"ELSE CAST({parent_u} AS BIGINT) END AS parent_id, face, "
        "CAST(sum(n) AS BIGINT) AS n_docs FROM lvl GROUP BY 1, 2"
    )
