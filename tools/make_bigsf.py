"""Synthesize a 10x ("sf1.0-equivalent") benchmark corpus under /tmp
by deterministic replication of the read-only sf0.1 tables — the
robustness-evidence input VERDICT r4 #2 asks for (the sandbox has no
/root/testdata/sf1.0 and testdata is read-only).

Each copy c (0..9) offsets every id key by c * stride (keys stay
contiguous where the engine relies on contiguity: doc_id/vec_id run
0..10N-1) and MUTATES payloads so the scaled corpus is not 10
byte-identical replicas (which would turn every dedup query into a
pathological all-duplicates workload):

- documents: copy c > 0 appends a per-copy token ' rep<c>' to text
  (n_chars updated to match — several queries assert that
  invariant);
- embeddings: copy c perturbs dimension (c mod d) by +c * 1e-3
  before float32 cast, so vectors are distinct but the cluster
  structure survives;
- orders/lineitem: o_orderkey/l_orderkey offset by c * 10^9
  (cust/part/supp keys unchanged — referential integrity holds, each
  customer simply has 10x orders, the realistic scaling direction);
- events: event_id offset, ts shifted +c days, user_id unchanged
  (10x events per user).

Dimension tables (region nation customer supplier part) are copied
as-is: scaling facts against fixed dimensions is the TPC-H shape.

Usage: python tools/make_bigsf.py [--out /tmp/sfbig] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def replicate(out_dir: str, copies: int) -> None:
    os.makedirs(out_dir, exist_ok=True)

    for name in ("region", "nation", "customer", "supplier", "part"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{out_dir}/{name}.parquet")

    docs = pq.read_table(f"{SRC}/documents.parquet")
    n_docs = docs.num_rows
    parts = []
    for c in range(copies):
        t = docs
        ids = pc.add(t.column("doc_id"), c * n_docs)
        if c:
            text = pc.binary_join_element_wise(
                t.column("text").cast(pa.string()), f" rep{c}", ""
            )
            nch = pc.utf8_length(text).cast(pa.int64())
        else:
            text = t.column("text")
            nch = t.column("n_chars")
        parts.append(
            pa.table(
                {
                    "doc_id": ids,
                    "text": text,
                    "lang": t.column("lang"),
                    "source": t.column("source"),
                    "n_chars": nch,
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/documents.parquet")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    n_emb = emb.num_rows
    col = emb.column("embedding").combine_chunks()
    d = len(col[0])
    mat = col.values.to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, d)
    parts = []
    for c in range(copies):
        m = mat.copy()
        m[:, c % d] += c * 1e-3
        flat = m.astype(np.float32).reshape(-1)
        arr = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n_emb + 1) * d, d, dtype=np.int32)),
            pa.array(flat, pa.float32()),
        )
        parts.append(
            pa.table(
                {
                    "vec_id": pc.add(emb.column("vec_id"), c * n_emb),
                    "embedding": arr,
                    "label": emb.column("label"),
                }
            )
        )
    pq.write_table(
        pa.concat_tables(parts).cast(emb.schema), f"{out_dir}/embeddings.parquet"
    )

    orders = pq.read_table(f"{SRC}/orders.parquet")
    parts = []
    for c in range(copies):
        parts.append(
            orders.set_column(
                0, "o_orderkey", pc.add(orders.column("o_orderkey"), c * 10**9)
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/orders.parquet")

    li = pq.read_table(f"{SRC}/lineitem.parquet")
    parts = []
    for c in range(copies):
        parts.append(
            li.set_column(
                0, "l_orderkey", pc.add(li.column("l_orderkey"), c * 10**9)
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/lineitem.parquet")

    ev = pq.read_table(f"{SRC}/events.parquet")
    n_ev = ev.num_rows
    parts = []
    day_us = 86_400_000_000
    for c in range(copies):
        t = ev.set_column(0, "event_id", pc.add(ev.column("event_id"), c * n_ev))
        ts = pc.add(t.column("ts").cast(pa.int64()), c * day_us).cast(
            pa.timestamp("us")
        )
        parts.append(t.set_column(1, "ts", ts))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/events.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sfbig")
    ap.add_argument("--copies", type=int, default=10)
    a = ap.parse_args()
    replicate(a.out, a.copies)
    for f in sorted(os.listdir(a.out)):
        print(f, pq.read_metadata(os.path.join(a.out, f)).num_rows)


if __name__ == "__main__":
    main()
