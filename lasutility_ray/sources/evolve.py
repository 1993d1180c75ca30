"""Schema-evolution reads: a long-lived 100 TB corpus is written over
months by different pipeline versions — early shards LACK columns
added later and may carry NARROWER integer types. This source-layer
utility reads such a mixed-shard lake against a declared TARGET
schema: missing columns materialize as typed nulls, narrower integers
widen losslessly, column order normalizes — per batch, zero shuffle,
so the evolution cost is a map over exactly the shards read.

(Ray's read_parquet can unify schemas only when pyarrow's dataset
unification succeeds; declaring the target makes the contract
explicit and keeps old shards readable forever — the append-only
data-lake rule.)"""

from __future__ import annotations

import pyarrow as pa


def read_evolving_parquet(paths: list[str], target: pa.Schema):
    """Parquet shards (heterogeneous schemas) -> one Dataset with
    exactly the ``target`` schema."""
    import ray.data as rd

    def conform(t: pa.Table) -> pa.Table:
        cols = []
        n = t.num_rows
        for f in target:
            if f.name in t.column_names:
                cols.append(t.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.table(dict(zip(target.names, cols)))

    parts = [
        rd.read_parquet(p).map_batches(conform, batch_format="pyarrow")
        for p in paths
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
