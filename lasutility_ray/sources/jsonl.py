"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM training-data interchange (every open corpus release ships .jsonl
shards). Writer: one shard per block via pandas' vectorized
``to_json(orient="records", lines=True)`` (no per-row python dumps);
reader: Ray's native ``read_json`` with the shard list made explicit
(the clustered.py lesson: name the files, keep the read audit
trivial). Round-trip fidelity is the contract — the q_jsonl_roundtrip
oracle compares the read-back against the source table value-exactly,
newline/unicode escapes included."""

from __future__ import annotations

import os

import pyarrow as pa


def write_jsonl_shards(ds, path: str, cols: list[str] | None = None) -> str:
    """Dataset -> ``path/part-*.jsonl`` (one shard per input block)."""
    os.makedirs(path, exist_ok=True)

    def dump(t: pa.Table, ctx: "object" = None) -> pa.Table:
        import uuid

        df = t.to_pandas()
        if cols:
            df = df[cols]
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.jsonl")
        tmp = name + ".tmp"
        df.to_json(tmp, orient="records", lines=True, force_ascii=False)
        os.replace(tmp, name)  # atomic publish (resumable-output rule)
        return pa.table({"shard": pa.array([name], pa.string()),
                         "n_rows": pa.array([len(df)], pa.int64())})

    # consume the write pipeline; the manifest table is tiny
    ds.map_batches(dump, batch_format="pyarrow").materialize()
    return path


def read_jsonl(path: str):
    """``path/*.jsonl`` -> Dataset (explicit shard list)."""
    import ray.data as rd

    shards = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".jsonl")
    )
    if not shards:
        return rd.from_arrow(pa.table({}))
    return rd.read_json(shards)
