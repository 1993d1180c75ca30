"""Bucketed lookup join: attach columns from a (key, payload) table to
another dataset's rows, fully in-cluster.

``Dataset.join`` in Ray 2.49 crashes when a hash partition receives no
left-side shard (the aggregator builds a schema-less empty table and
``pyarrow.Table.join`` then fails with "No match ... for key field") —
which is the NORMAL case for a sparse left side such as a candidate
pair list. This helper uses the engine's established coarse-bucket
co-group shape instead (see ``pip_join.py``/``dedup.py``):

1. both sides map to a shared wide schema (absent columns null) with a
   ``__bucket = hash(key) % n_buckets`` shuffle key and a ``__side``
   tag;
2. ONE ``groupby(__bucket)`` co-groups them; inside each bucket a
   C-speed ``pandas.merge`` performs the inner lookup.

The shuffle moves each side exactly once; no partition can be empty-
schemed because every group block carries the full union schema.
``n_buckets`` bounds parallelism of the merge stage — raise it with
cluster size (it is a shuffle-key fanout, not a correctness knob).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_BUCKETS = 64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def default_n_buckets(minimum: int = N_BUCKETS) -> int:
    """Coarse-bucket fanout scaled to the cluster: ~4 buckets per CPU
    (so the in-bucket merge stage can use every core) with a floor.
    Bucket count only affects partitioning, never results."""
    try:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 0)) if _ray.is_initialized() else 0
    except Exception:
        cpus = 0
    return max(minimum, cpus * 4)


def _bucket_of(key: np.ndarray, n_buckets: int) -> np.ndarray:
    h = key.astype(np.uint64) * _MIX
    return ((h >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int64)


def _is_str_key(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    )


def _str_bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Bucket id for a string/binary key column: full-content siphash
    (pandas' fixed-key vectorized hash — deterministic across
    processes), so shared prefixes don't skew buckets. Collisions only
    co-group; the merge itself compares full key values."""
    vals = np.asarray(col.to_numpy(zero_copy_only=False), dtype=object)
    return (pd.util.hash_array(vals) % np.uint64(n_buckets)).astype(np.int64)


def _arrow_schema(ds, type_overrides: dict | None = None) -> pa.Schema:
    """Unified pyarrow schema for a Dataset whose blocks may be Arrow
    or pandas. Pandas-block schemas carry numpy dtypes; ``object``
    dtype is ambiguous (str vs bytes) and must be named in
    ``type_overrides``."""
    over = type_overrides or {}
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return pa.schema(
            [(f.name, over.get(f.name, f.type)) for f in base]
        )
    fields = []
    for name, dtype in zip(base.names, base.types):
        if name in over:
            fields.append((name, over[name]))
        elif dtype == np.dtype("O"):
            raise TypeError(
                f"lookup_join: column {name!r} has ambiguous pandas object "
                "dtype — pass its arrow type via type_overrides"
            )
        else:
            fields.append((name, pa.from_numpy_dtype(dtype)))
    return pa.schema(fields)


HOT_THRESHOLD = 1 << 20  # left rows per key before auto-salting kicks in
MAX_HOT_FANOUT = 64


def _hot_left_fanouts(
    left_ds, left_key: str, str_key: bool, key_type, hot_threshold: int
) -> dict:
    """Detect skewed LEFT keys: one slim pre-pass (per-batch distinct
    (key, count) partials -> key groupby -> filter > threshold -> tiny
    driver table). Returns {key: fanout} with fanout =
    ceil(count / threshold) capped at MAX_HOT_FANOUT; empty for
    well-distributed keys. The collected set is bounded by
    total_left_rows / hot_threshold by construction."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        if str_key:
            vc = t.column(left_key).cast(key_type).to_pandas().value_counts()
            keys = pa.array(vc.index.to_numpy(), key_type)
            ns = vc.to_numpy().astype(np.int64)
        else:
            key = t.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
            u, c = np.unique(key, return_counts=True)
            keys = pa.array(u, pa.int64())
            ns = c.astype(np.int64)
        return pa.table({"__key": keys, "n": pa.array(ns, pa.int64())})

    def keep_hot(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy()
        return t.filter(pa.array(n > hot_threshold))

    hot = (
        left_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__key")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(keep_hot, batch_format="pyarrow")
        .to_pandas()
    )
    if hot.empty:
        return {}
    fan = np.minimum(
        -(-hot["n"].to_numpy(dtype=np.int64) // hot_threshold), MAX_HOT_FANOUT
    )
    return {k: int(f) for k, f in zip(hot["__key"].tolist(), fan)}


def lookup_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    attach: dict[str, str],
    n_buckets: int | None = None,
    type_overrides: dict | None = None,
    n_salt: int | str = 1,
    multi: bool = False,
    how: str = "inner",
    hot_threshold: int = HOT_THRESHOLD,
):
    """Inner-join ``right_ds``'s ``attach`` columns onto ``left_ds``.

    ``attach`` maps right-side column name -> output column name.
    Keys are either integers (int64-castable; values above 2^63 are
    rejected by the cast) or strings/binary (both sides must agree on
    the family — string keys shuffle by full-content hash and merge on
    the exact value). Left rows without a match are dropped (inner
    semantics);
    right rows may match many left rows. By default the right side's
    KEYS must be unique — duplicate right keys raise (which payload
    row would win is block-arrival order, i.e. nondeterministic).
    ``multi=True`` instead emits ONE OUTPUT ROW PER MATCH (full
    many-to-many inner join; deterministic because every match is
    kept, none chosen) — output size is the join cardinality, so keep
    the right side's per-key fan-out bounded.
    Output columns: all left columns + attached columns, with their
    original integer widths/signedness preserved.
    ``type_overrides`` resolves ambiguous pandas-object columns (and
    may force e.g. binary) by column name, either side.

    ``how`` selects the join flavor: ``"inner"`` (default) attaches
    payload columns; ``"semi"`` keeps left rows WITH a right match and
    ``"anti"`` keeps left rows WITHOUT one — both return only the left
    columns and require an empty ``attach`` (membership tests, e.g.
    incremental dedup against a seen-hash table; duplicate right keys
    are harmless there and allowed).

    ``n_salt`` > 1 splits each key's LEFT rows across ``n_salt``
    sub-buckets (round-robin within each batch) and replicates every
    RIGHT row to all of them — the skew escape hatch for a hot left
    key that would otherwise put its whole row mass in one group.
    Right-side shuffle volume multiplies by ``n_salt`` (the right side
    is the small lookup side by contract), results are identical.

    ``n_salt="auto"`` instead detects the hot keys (one slim pre-pass
    over the left side: keys with more than ``hot_threshold`` left
    rows) and salts ONLY them — each hot key's left rows spread over
    ``ceil(count/threshold)`` sub-buckets (capped at
    ``MAX_HOT_FANOUT``) and only that key's right rows replicate.
    Well-distributed inputs pay one counting pass and nothing else;
    results are identical in every mode. NOTE: the counting pass is a
    SECOND consumption of ``left_ds`` — a lazy Dataset re-executes its
    upstream lineage per consumer, so materialize/checkpoint the left
    side first when its upstream is expensive (line_dedup does)."""
    if n_buckets is None:
        n_buckets = default_n_buckets()
    auto_salt = n_salt == "auto"
    if auto_salt:
        n_salt = 1
    elif not isinstance(n_salt, int) or n_salt < 1:
        raise ValueError(f'n_salt must be >= 1 or "auto" (got {n_salt!r})')
    if how not in ("inner", "semi", "anti"):
        raise ValueError(f"how must be inner|semi|anti (got {how!r})")
    if how != "inner" and attach:
        raise ValueError(f"how={how!r} is a membership test — attach must be empty")
    left_schema = _arrow_schema(left_ds, type_overrides)
    right_schema = _arrow_schema(right_ds, type_overrides)
    left_cols = list(left_schema.names)
    right_cols = [right_key] + list(attach)
    out_attach = list(attach.values())
    str_key = _is_str_key(left_schema.field(left_key).type)
    if str_key != _is_str_key(right_schema.field(right_key).type):
        raise TypeError(
            "lookup_join: key families differ — left "
            f"{left_schema.field(left_key).type} vs right "
            f"{right_schema.field(right_key).type}"
        )
    key_type = pa.large_string() if str_key else pa.int64()

    hot_ref = None
    hot_span = 1
    if auto_salt:
        import ray

        hot_map = _hot_left_fanouts(left_ds, left_key, str_key, key_type, hot_threshold)
        if hot_map:
            hot_span = max(hot_map.values())
            hot_ref = ray.put(hot_map)

    def _fanouts(key_series: pd.Series) -> np.ndarray:
        import ray

        hot = ray.get(hot_ref)
        return key_series.map(hot).fillna(1).to_numpy(dtype=np.int64)

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).cast(left_schema.field(c).type) for c in left_cols}
        if str_key:
            cols["__key"] = t.column(left_key).cast(key_type)
            bucket = _str_bucket_of(t.column(left_key), n_buckets)
        else:
            key = t.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
            cols["__key"] = pa.array(key, pa.int64())
            bucket = _bucket_of(key, n_buckets)
        for rc in attach:
            cols["__r_" + rc] = pa.nulls(len(t), right_schema.field(rc).type)
        cols["__side"] = pa.array(np.zeros(len(t), dtype=np.int8))
        if n_salt > 1:
            salt = np.arange(len(t), dtype=np.int64) % n_salt
            bucket = bucket * n_salt + salt
        elif hot_ref is not None:
            fan = _fanouts(cols["__key"].to_pandas())
            salt = np.arange(len(t), dtype=np.int64) % fan
            bucket = bucket * hot_span + salt
        cols["__bucket"] = pa.array(bucket)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        # column pruning happens HERE, not via Dataset.select_columns:
        # Ray 2.49's Project operator crashes on pandas-backed blocks
        # ('DataFrame' object has no attribute 'rename_columns'), and
        # aggregate outputs feeding a lookup_join are pandas blocks
        t = t.select(right_cols)
        salt_r = None
        if n_salt > 1:
            t = t.take(np.repeat(np.arange(len(t)), n_salt))
        elif hot_ref is not None:
            kv = t.column(right_key).cast(key_type).to_pandas()
            fan = _fanouts(kv)
            t = t.take(np.repeat(np.arange(len(t)), fan))
            # per-replica salt 0..fan-1 via the grouped-arange trick
            salt_r = np.arange(len(t), dtype=np.int64) - np.repeat(
                np.cumsum(fan) - fan, fan
            )
        cols = {}
        for c in left_cols:
            cols[c] = pa.nulls(len(t), left_schema.field(c).type)
        if str_key:
            cols["__key"] = t.column(right_key).cast(key_type)
            bucket = _str_bucket_of(t.column(right_key), n_buckets)
        else:
            key = t.column(right_key).to_numpy(zero_copy_only=False).astype(np.int64)
            cols["__key"] = pa.array(key, pa.int64())
            bucket = _bucket_of(key, n_buckets)
        for rc in attach:
            cols["__r_" + rc] = t.column(rc).cast(right_schema.field(rc).type)
        cols["__side"] = pa.array(np.ones(len(t), dtype=np.int8))
        if n_salt > 1:
            salt = np.tile(np.arange(n_salt, dtype=np.int64), len(t) // n_salt)
            bucket = bucket * n_salt + salt
        elif salt_r is not None:
            bucket = bucket * hot_span + salt_r
        elif hot_ref is not None:
            bucket = bucket * hot_span
        cols["__bucket"] = pa.array(bucket)
        return pa.table(cols)

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow")
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow")
    both = lt.union(rt)

    r_names = ["__r_" + rc for rc in attach]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lv = g[g["__side"] == 0]
        rv = g[g["__side"] == 1]
        if how != "inner":
            isin = lv["__key"].isin(rv["__key"])
            out = lv[isin] if how == "semi" else lv[~isin]
            out = out[left_cols].copy()
            for c in left_cols:
                t = left_schema.field(c).type
                if pa.types.is_integer(t):
                    out[c] = out[c].astype(t.to_pandas_dtype())
            return out
        if len(lv) == 0 or len(rv) == 0:
            out = lv.iloc[0:0]
        else:
            rv = rv[["__key"] + r_names]
            if not multi and rv["__key"].duplicated().any():
                raise ValueError(
                    "lookup_join: right side has duplicate keys — the "
                    "attached payload would be nondeterministic "
                    "(pass multi=True for a row per match)"
                )
            out = lv.drop(columns=r_names).merge(rv, on="__key", how="inner")
        out = out[left_cols + r_names].rename(columns=dict(zip(r_names, out_attach)))
        # the group block carries the OTHER side's rows with nulls in
        # these columns, so pandas upcast ints to float64 — cast back
        # to each column's DECLARED type (post-merge rows have no
        # nulls by construction; blanket int64 would corrupt uint64
        # and silently widen narrow ints)
        for c in left_cols:
            t = left_schema.field(c).type
            if pa.types.is_integer(t):
                out[c] = out[c].astype(t.to_pandas_dtype())
        for rc, oc in attach.items():
            t = right_schema.field(rc).type
            if pa.types.is_integer(t):
                out[oc] = out[oc].astype(t.to_pandas_dtype())
        return out

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def group_apply_bucketed(ds, key_col: str, fn, n_buckets: int | None = None):
    """``ds.groupby(key_col).map_groups(fn)`` with the per-group UDF
    dispatch paid at C speed.

    Ray 2.49's ``map_groups`` slices and format-converts once per
    group inside the sort-shuffled blocks — measured ~11 s of pure
    overhead for a NOOP over 576 groups x 4M rows, dwarfing the actual
    0.3 s sort. This helper shuffles on a coarse int bucket of the key
    (full-content siphash for string keys) and applies ``fn`` per key
    via an in-bucket ``pandas.groupby`` — the engine's established
    coarse-bucket shape (see voxelize/sessionize/line_dedup).

    ``fn`` must CONSTRUCT its output frame (not mutate/pass through
    the input — the input ``sub`` still carries the bucket column).
    Group order within/across buckets is unspecified, as with
    map_groups."""
    n_buckets = n_buckets or default_n_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        col = t.column(key_col)
        if _is_str_key(col.type):
            b = _str_bucket_of(col, n_buckets)
        else:
            b = _bucket_of(
                col.to_numpy(zero_copy_only=False).astype(np.int64), n_buckets
            )
        return t.append_column("__gab_bucket", pa.array(b, pa.int64()))

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = [
            fn(sub.drop(columns="__gab_bucket"))
            for _, sub in g.groupby(key_col, sort=False)
        ]
        return pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__gab_bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )
