"""From-scratch S2 cell-id codec (quad-tree on the cube, Hilbert order).

The north rule names "H3/S2 index" as a first-class component of the
tiling engine; this module implements the S2 scheme from the PUBLIC
algorithm description (s2geometry.io "S2 Cell Hierarchy" docs and the
Apache-licensed reference semantics): a unit sphere projected onto 6
cube faces, each face a 30-level quad tree in (s, t) coordinates with
the quadratic area-equalizing u<->s transform, leaf positions ordered
by a face-continuous Hilbert curve, all packed into a 64-bit cell id

    id = face(3 bits) | hilbert_position(2*level bits) | 1 | 0...

so that every cell's descendants form one contiguous id range
(``range_min``/``range_max``) and ``parent`` is pure bit arithmetic.
Everything here is written from the published math — no S2 library
exists in this environment (and none is imported).

Exact-oracle design: the face/(u,v) step only uses *ratios* of the
direction vector's components, so the codec accepts UNNORMALIZED
direction vectors.  The whole pipeline direction -> face -> uv ->
quadratic st (one IEEE sqrt) -> ij (one floor + clamp) -> Hilbert
walk (pure int64 table lookups) is then reproducible bit-for-bit in
DuckDB SQL — see :func:`sql_ctes`, which unrolls the 8-round Hilbert
FSM over the same generated 1024-entry lookup table.  The lon/lat
entry point (:func:`lonlat_to_cell`) adds only a trig prelude and is
pinned by invariant tests instead of the SQL oracle.

Reference parity note: this plays the same role as the reference's
km-grid tile codec (``Nls/TileNamer.cs``) — a hierarchical spatial
partition key for the groupby shuffle — generalized to the sphere.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL + 1  # 61
_LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2

# Hilbert sub-cell orders / orientation changes (public S2 constants:
# the canonical traversal (0,0) (0,1) (1,1) (1,0) and its symmetries).
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)


def _build_lookups() -> tuple[np.ndarray, np.ndarray]:
    """lookup_pos[(ij16 << 2) | orient] = (pos8 << 2) | new_orient and
    its inverse lookup_ij, built by walking the Hilbert recursion 4
    levels deep (16x16 sub-grid) for each starting orientation."""
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def rec(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
            return
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orient]
        for sub in range(4):
            rec(
                level + 1,
                i + (r[sub] >> 1),
                j + (r[sub] & 1),
                orig,
                pos + sub,
                orient ^ _POS_TO_ORIENT[sub],
            )

    for orient in range(4):
        rec(0, 0, 0, orient, 0, orient)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookups()


# ------------------------------------------------------------ encode


def face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Unnormalized direction -> (face, u, v).  Tie rule on equal
    absolute components matches the fixed comparison order below and
    is mirrored verbatim in :func:`sql_ctes`."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    # the all-zero vector has no direction; pin it to +x (mirrored in
    # sql_ctes so both engines agree)
    x = np.where((x == 0.0) & (y == 0.0) & (z == 0.0), 1.0, x)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(axis, (x, y, z))
    face = axis + np.where(comp < 0, 3, 0)
    # per-face (u, v) as ratios (the published face chart):
    #   0:( y/x,  z/x) 1:(-x/y,  z/y) 2:(-x/z, -y/z)
    #   3:( z/x,  y/x) 4:( z/y, -x/y) 5:(-y/z, -x/z)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(face, (y / x, -x / y, -x / z, z / x, z / y, -y / z))
        v = np.choose(face, (z / x, z / y, -y / z, y / x, -x / y, -x / z))
    return face.astype(np.int64), u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic area-equalizing transform (the S2 default)."""
    u = np.asarray(u, np.float64)
    with np.errstate(invalid="ignore"):
        # np.where evaluates both branches; the inactive branch's
        # sqrt of a negative is discarded
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    s = np.asarray(s, np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s: np.ndarray) -> np.ndarray:
    lim = np.int64(1) << MAX_LEVEL
    return np.clip(np.floor(s * float(lim)).astype(np.int64), 0, lim - 1)


def _hilbert_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """face,i,j (leaf, 30-bit) -> 60-bit Hilbert position, 8 rounds of
    4 bits through LOOKUP_POS."""
    bits = (face & SWAP_MASK).astype(np.int64)
    pos = np.zeros(face.shape, dtype=np.int64)
    for k in range(7, -1, -1):
        idx = (
            bits
            + (((i >> (k * _LOOKUP_BITS)) & 15) << (_LOOKUP_BITS + 2))
            + (((j >> (k * _LOOKUP_BITS)) & 15) << 2)
        )
        r = LOOKUP_POS[idx]
        pos |= (r >> 2) << np.int64(k * 2 * _LOOKUP_BITS)
        bits = r & 3
    return pos


def xyz_to_cell(x, y, z, level: int = MAX_LEVEL) -> np.ndarray:
    """Unnormalized directions -> uint64 S2 cell ids at ``level``."""
    face, u, v = face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    pos = _hilbert_pos(face, i, j)
    leaf = (
        (face.astype(np.uint64) << np.uint64(_POS_BITS))
        | (pos.astype(np.uint64) << np.uint64(1))
        | np.uint64(1)
    )
    return parent(leaf, level)


_DEG = 0.017453292519943295  # pi / 180 as one double literal


def lonlat_to_cell(lon_deg, lat_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """Degrees on the sphere -> cell ids (trig prelude + xyz path)."""
    phi = np.asarray(lat_deg, np.float64) * _DEG
    lam = np.asarray(lon_deg, np.float64) * _DEG
    cphi = np.cos(phi)
    return xyz_to_cell(cphi * np.cos(lam), cphi * np.sin(lam), np.sin(phi), level)


# --------------------------------------------------------- hierarchy


def lsb(cell: np.ndarray) -> np.ndarray:
    cell = np.asarray(cell, np.uint64)
    return cell & (~cell + np.uint64(1))


def level(cell: np.ndarray) -> np.ndarray:
    """MAX_LEVEL - trailing_zero_bits/2."""
    l = lsb(cell)
    # log2 of a power of two via float is exact up to 2^63
    tz = np.log2(l.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def parent(cell: np.ndarray, lvl: int) -> np.ndarray:
    cell = np.asarray(cell, np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - lvl))
    return (cell & ~(new_lsb - np.uint64(1))) | new_lsb


def range_min(cell: np.ndarray) -> np.ndarray:
    cell = np.asarray(cell, np.uint64)
    return cell - (lsb(cell) - np.uint64(1))


def range_max(cell: np.ndarray) -> np.ndarray:
    cell = np.asarray(cell, np.uint64)
    return cell + (lsb(cell) - np.uint64(1))


def face_of(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, np.uint64) >> np.uint64(_POS_BITS)).astype(np.int64)


def token(cell: int) -> str:
    """Canonical S2 token: lowercase hex, trailing zeros stripped."""
    h = f"{int(cell):016x}".rstrip("0")
    return h if h else "X"


def from_token(tok: str) -> int:
    if tok == "X":
        return 0
    return int(tok.ljust(16, "0"), 16)


# ------------------------------------------------------------ decode


def cell_to_face_ij(cell: np.ndarray):
    """Cell id (any level) -> (face, i, j) of a leaf inside the cell
    (the id's own position bits; for non-leaf cells the trailing
    1000.. marker walks to an interior descendant)."""
    cell = np.asarray(cell, np.uint64)
    face = face_of(cell)
    bits = (face & SWAP_MASK).astype(np.int64)
    i = np.zeros(cell.shape, dtype=np.int64)
    j = np.zeros(cell.shape, dtype=np.int64)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        chunk = (
            (cell >> np.uint64(k * 2 * _LOOKUP_BITS + 1)).astype(np.int64)
            & ((1 << (2 * nbits)) - 1)
        ) << 2
        bits += chunk
        r = LOOKUP_IJ[bits]
        i |= (r >> (_LOOKUP_BITS + 2)) << np.int64(k * _LOOKUP_BITS)
        j |= ((r >> 2) & ((1 << _LOOKUP_BITS) - 1)) << np.int64(k * _LOOKUP_BITS)
        bits = r & 3
    return face, i, j


_FACE_XYZ = (
    # face: (x, y, z) as functions of (u, v); chart inverse of face_uv
    lambda u, v: (np.ones_like(u), u, v),
    lambda u, v: (-u, np.ones_like(u), v),
    lambda u, v: (-u, -v, np.ones_like(u)),
    lambda u, v: (-np.ones_like(u), -v, -u),
    lambda u, v: (v, -np.ones_like(u), -u),
    lambda u, v: (v, u, -np.ones_like(u)),
)


def cell_to_xyz(cell: np.ndarray):
    """Cell -> an interior direction vector (center of the decoded
    leaf), unnormalized."""
    face, i, j = cell_to_face_ij(cell)
    lim = float(np.int64(1) << MAX_LEVEL)
    u = st_to_uv((i.astype(np.float64) + 0.5) / lim)
    v = st_to_uv((j.astype(np.float64) + 0.5) / lim)
    xs = np.empty(len(u))
    ys = np.empty(len(u))
    zs = np.empty(len(u))
    for f in range(6):
        m = face == f
        if m.any():
            a, b, c = _FACE_XYZ[f](u[m], v[m])
            xs[m], ys[m], zs[m] = a, b, c
    return xs, ys, zs


def cell_to_lonlat(cell: np.ndarray):
    x, y, z = cell_to_xyz(cell)
    lat = np.arctan2(z, np.sqrt(x * x + y * y)) / _DEG
    lon = np.arctan2(y, x) / _DEG
    return lon, lat


# ---------------------------------------------------------- covering


def children(cell: int) -> list:
    """The four level+1 children of a non-leaf cell (dyadic id
    arithmetic: parent id p with marker l -> p - l + (2k+1) * l/4)."""
    l = int(lsb(np.uint64(cell)))
    if l < 4:
        raise ValueError("leaf cells have no children")
    return [int(cell) - l + (2 * k + 1) * (l // 4) for k in range(4)]


def _cell_geometry(cell: int):
    """(unit center xyz, max corner angle) of a cell — its bounding
    spherical cap, from the dyadic ij square the Hilbert id covers."""
    c = np.uint64(cell)
    lvl = int(level(np.array([c]))[0])
    face, i_leaf, j_leaf = cell_to_face_ij(np.array([c]))
    size = np.int64(1) << np.int64(MAX_LEVEL - lvl)
    i0 = (i_leaf[0] // size) * size
    j0 = (j_leaf[0] // size) * size
    lim = float(np.int64(1) << MAX_LEVEL)
    us = st_to_uv(np.array([i0, i0 + size], dtype=np.float64) / lim)
    vs = st_to_uv(np.array([j0, j0 + size], dtype=np.float64) / lim)
    cu = st_to_uv(np.array([(float(i0) + size / 2.0) / lim]))[0]
    cv = st_to_uv(np.array([(float(j0) + size / 2.0) / lim]))[0]
    f = int(face[0])
    cx, cy, cz = (a[0] for a in _FACE_XYZ[f](np.array([cu]), np.array([cv])))
    cn = np.sqrt(cx * cx + cy * cy + cz * cz)
    center = np.array([cx, cy, cz]) / cn
    r = 0.0
    for u in us:
        for v in vs:
            x, y, z = (a[0] for a in _FACE_XYZ[f](np.array([u]), np.array([v])))
            n = np.sqrt(x * x + y * y + z * z)
            d = (center[0] * x + center[1] * y + center[2] * z) / n
            r = max(r, float(np.arccos(np.clip(d, -1.0, 1.0))))
    return center, r


def cap_covering(center_xyz, angle_rad: float, max_level: int = 8) -> np.ndarray:
    """Cells (mixed levels <= ``max_level``) covering the spherical
    cap — the S2RegionCoverer role: a query region becomes a cell
    set whose [range_min, range_max] intervals prune a cell-keyed
    corpus (no false negatives; conservative on boundary cells).

    BFS from the 6 face cells; a cell fully inside the cap is emitted
    as-is, an intersecting cell splits until ``max_level``."""
    c = np.asarray(center_xyz, np.float64)
    c = c / np.sqrt((c * c).sum())
    out = []
    # the six level-0 face cells
    stack = [int((np.uint64(f) << np.uint64(_POS_BITS)) | np.uint64(1 << 60)) for f in range(6)]
    if angle_rad >= np.pi:
        # whole sphere: the triangle-inequality inside-test is too
        # conservative for the antipodal faces; short-circuit
        return np.array(sorted(stack), dtype=np.uint64)
    while stack:
        cell = stack.pop()
        cc, r = _cell_geometry(cell)
        d = float(np.arccos(np.clip(float((cc * c).sum()), -1.0, 1.0)))
        if d > r + angle_rad:
            continue  # disjoint
        if d + r <= angle_rad or int(level(np.array([np.uint64(cell)]))[0]) >= max_level:
            out.append(cell)  # fully inside, or resolution floor
            continue
        stack.extend(children(cell))
    return np.array(sorted(out), dtype=np.uint64)


# -------------------------------------------------------- SQL mirror


def sql_ctes(src: str, x: str = "dx", y: str = "dy", z: str = "dz", level: int = 12) -> str:
    """DuckDB CTE chain computing the EXACT uint64 cell id (as a
    wraparound-signed BIGINT column ``cell_id``) from unnormalized
    direction columns of ``src`` — identical IEEE ops to
    :func:`xyz_to_cell`: ratio divisions, one sqrt per axis (correctly
    rounded in both engines), floor+clamp, then the 8-round integer
    Hilbert FSM unrolled over the same generated lookup table."""
    lut = ", ".join(str(int(v)) for v in LOOKUP_POS)
    lim = 1 << MAX_LEVEL
    # Each Hilbert round's lookup needs the previous round's low 2
    # bits, so the 8 rounds are emitted as one chained CTE each.
    ctes = [
        f"s2lut AS (SELECT [{lut}] AS lp)",
        (
            f"s2d AS (SELECT *, CASE WHEN {x} = 0 AND {y} = 0 AND {z} = 0 "
            f"THEN 1.0 ELSE {x} END AS sx, {y} AS sy, {z} AS sz FROM {src})"
        ),
        (
            "s2ax AS (SELECT *, abs(sx) AS axv, abs(sy) AS ayv, abs(sz) AS azv "
            "FROM s2d)"
        ),
        (
            "s2axis AS (SELECT *, CASE WHEN axv > ayv THEN "
            "(CASE WHEN axv > azv THEN 0 ELSE 2 END) ELSE "
            "(CASE WHEN ayv > azv THEN 1 ELSE 2 END) END AS axis FROM s2ax)"
        ),
        (
            "s2face0 AS (SELECT *, CASE axis WHEN 0 THEN sx WHEN 1 THEN sy "
            "ELSE sz END AS comp FROM s2axis)"
        ),
        (
            "s2face1 AS (SELECT *, axis + CASE WHEN comp < 0 THEN 3 ELSE 0 END "
            "AS face FROM s2face0)"
        ),
        (
            "s2uv AS (SELECT *, CASE face "
            "WHEN 0 THEN sy / sx WHEN 1 THEN -sx / sy WHEN 2 THEN -sx / sz "
            "WHEN 3 THEN sz / sx WHEN 4 THEN sz / sy ELSE -sy / sz END AS u, "
            "CASE face "
            "WHEN 0 THEN sz / sx WHEN 1 THEN sz / sy WHEN 2 THEN -sy / sz "
            "WHEN 3 THEN sy / sx WHEN 4 THEN -sx / sy ELSE -sx / sz END AS v "
            "FROM s2face1)"
        ),
        (
            "s2st AS (SELECT *, "
            "CASE WHEN u >= 0 THEN 0.5 * sqrt(1 + 3 * u) "
            "ELSE 1 - 0.5 * sqrt(1 - 3 * u) END AS s, "
            "CASE WHEN v >= 0 THEN 0.5 * sqrt(1 + 3 * v) "
            "ELSE 1 - 0.5 * sqrt(1 - 3 * v) END AS t FROM s2uv)"
        ),
        (
            f"s2f AS (SELECT *, "
            f"least(greatest(CAST(floor(s * {float(lim)!r}) AS BIGINT), 0), {lim - 1}) AS i, "
            f"least(greatest(CAST(floor(t * {float(lim)!r}) AS BIGINT), 0), {lim - 1}) AS j "
            "FROM s2st)"
        ),
    ]
    prev = "s2f"
    prev_bits = "(face & 1)"
    for k in range(7, -1, -1):
        name = f"s2h{k}"
        idx = (
            f"({prev_bits} + ((i >> {k * 4}) & 15) * 64"
            f" + ((j >> {k * 4}) & 15) * 4)"
        )
        ctes.append(
            f"{name} AS (SELECT {prev}.*, "
            f"list_extract(s2lut.lp, {idx} + 1) AS r{k} FROM {prev}, s2lut)"
        )
        prev = name
        prev_bits = f"(r{k} & 3)"
    pos = " + ".join(
        f"(CAST(r{k} AS BIGINT) // 4) * {1 << (k * 8)}" for k in range(7, -1, -1)
    )
    new_lsb = 1 << (2 * (MAX_LEVEL - level))
    # leaf = face*2^61 + pos*2 + 1 (HUGEINT), truncate to `level` via
    # arithmetic parent, then wrap to signed BIGINT.
    ctes.append(
        "s2cell AS (SELECT *, "
        f"(CAST(face AS HUGEINT) * {1 << _POS_BITS} + CAST({pos} AS HUGEINT) * 2 + 1) "
        "AS leaf_u FROM " + prev + ")"
    )
    ctes.append(
        "s2out AS (SELECT *, "
        f"(leaf_u // {2 * new_lsb}) * {2 * new_lsb} + {new_lsb} AS cell_u, "
        f"CASE WHEN (leaf_u // {2 * new_lsb}) * {2 * new_lsb} + {new_lsb} >= {1 << 63} "
        f"THEN CAST((leaf_u // {2 * new_lsb}) * {2 * new_lsb} + {new_lsb} - {1 << 64} AS BIGINT) "
        f"ELSE CAST((leaf_u // {2 * new_lsb}) * {2 * new_lsb} + {new_lsb} AS BIGINT) END "
        "AS cell_id FROM s2cell)"
    )
    return ", ".join(ctes)
