"""Relational operators over the corpus tables: distributed hash
equi-join + broadcast join.

The reference has no equi/hash joins (SURVEY.md §2.4: its joins are
all spatial); the engine adds them because a web-scale pipeline needs
them for conformance/url-keyed joins (§2.4 note) and for joining
point outputs back to page metadata. Two shapes:

- ``hash_join``: ``Dataset.join`` — Ray Data's hash-shuffle join;
  both sides repartitioned on the key. Use when both sides are big.
- ``broadcast_join``: the small side is ``ray.put`` once and probed
  inside ``map_batches`` via a vectorized ``pyarrow`` index lookup —
  no shuffle at all. The J2/M5 dict-lookup pattern generalized to an
  arbitrary small table (SURVEY.md §2.4 "broadcast small sides").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def hash_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 16,
    join_type: str = "inner",
):
    """Distributed hash join (both sides shuffled on the key)."""
    return left_ds.join(
        right_ds,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )


def topk_per_group(
    ds,
    group_col: str,
    order_col: str,
    tie_col: str,
    k: int = 3,
):
    """Top-k rows per group by (order_col desc, tie_col asc) — the O2
    top-1-per-cell shape generalized. Per-batch partial top-k shrinks
    the shuffle to at most k rows per (batch, group); the final
    per-group pass re-ranks the partials. ``tie_col`` must be unique
    within a group so the ranking is total (oracle uses the same
    ORDER BY)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values([order_col, tie_col], ascending=[False, True], kind="stable")
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(k), preserve_index=False
        )

    def final(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([order_col, tie_col], ascending=[False, True], kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
    )


class _BroadcastProbe:
    """Actor-pool probe: the small side is read from the object store
    once per actor (never re-shipped per batch)."""

    def __init__(self, small_ref, on: str, right_on: str, prefix: str):
        ref = small_ref[0] if isinstance(small_ref, list) else small_ref
        small: pa.Table = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.on = on
        self.keys = small.column(right_on)
        self.payload = small.drop_columns([right_on])
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column(self.on), value_set=self.keys)
        keep = pc.is_valid(idx)
        batch = batch.filter(keep)
        idx = idx.filter(keep)
        out = batch
        for name in self.payload.column_names:
            out = out.append_column(
                f"{self.prefix}{name}", self.payload.column(name).take(idx)
            )
        return out


def broadcast_join(left_ds, small_table: pa.Table, on: str, right_on: str | None = None,
                   prefix: str = "", concurrency: int = 4):
    """Inner join against a small in-memory table without a shuffle.
    ``small_table``'s join key must be unique."""
    right_on = right_on or on
    ref = ray.put(small_table.combine_chunks())
    return left_ds.map_batches(
        _BroadcastProbe,
        fn_constructor_kwargs={
            "small_ref": [ref],
            "on": on,
            "right_on": right_on,
            "prefix": prefix,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
