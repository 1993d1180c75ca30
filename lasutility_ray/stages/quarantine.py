"""Poison-row quarantine: a 100 TB run must never die on one
malformed document. ``quarantine_map_batches`` wraps any per-batch
transform: a batch that raises is BISECTED (log2 splits) until the
failing rows are isolated row-exactly; clean sub-batches still flow
through the real transform, the poison rows are published to a
quarantine Parquet sink (atomic part files, the resumable-output
rule) with the exception text attached for triage. Cost on the happy
path is zero (one try per batch); a poisoned batch pays
O(log2(batch)) re-runs of the transform on halves — bounded,
and only on the batches that would otherwise kill the job.

Determinism: output rows equal the transform applied to exactly the
non-poison rows (pinned value-exact); the quarantine sink holds
exactly the poison rows."""

from __future__ import annotations

import hashlib
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


def _row_digest(row: pa.Table, err: str) -> str:
    """Content hash of ONE serialized row + error text. Streaming
    over the Arrow IPC bytes (deterministic for a given schema +
    values), never ``repr(to_pylist())`` — no Python-object
    materialization of binary payloads (round-4 advice)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, row.schema) as w:
        w.write_table(row)
    h = hashlib.blake2b(digest_size=16)
    h.update(err[:500].encode("utf-8", "replace"))
    h.update(sink.getvalue())
    return h.hexdigest()


def _publish_quarantine(rows: pa.Table, path: str, err: str) -> None:
    os.makedirs(path, exist_ok=True)
    # Part names are a pure function of EACH poison row's content +
    # error — one part file PER ROW — so any retry that isolates the
    # same row republishes the same file (os.replace overwrite)
    # regardless of how the retry re-bisected the surrounding batch
    # boundaries (round-4 advice: batch-level hashes only deduped
    # retries that replayed the identical batch).
    for i in range(rows.num_rows):
        row = rows.slice(i, 1)
        out = row.append_column("__error", pa.array([err[:500]], pa.string()))
        name = os.path.join(path, f"poison-{_row_digest(row, err)}.parquet")
        tmp = f"{name}.{uuid.uuid4().hex}.tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, name)


def quarantine_map_batches(ds, fn, quarantine_path: str, batch_size: int = 4096):
    """``ds.map_batches(fn)`` that survives poison rows (see module
    docstring). ``fn``: pa.Table -> pa.Table."""

    def safe(t: pa.Table) -> pa.Table:
        try:
            return fn(t)
        except Exception:
            pass
        # bisect to isolate the poison rows
        good: list[pa.Table] = []

        def walk(part: pa.Table) -> None:
            try:
                good.append(fn(part))
                return
            except Exception as ex:
                if part.num_rows <= 1:
                    _publish_quarantine(part, quarantine_path, repr(ex))
                    return
            mid = part.num_rows // 2
            walk(part.slice(0, mid))
            walk(part.slice(mid))

        walk(t)
        good = [g for g in good if g.num_rows]
        if not good:
            # schema probe: the transform of zero rows defines it
            return fn(t.slice(0, 0))
        return pa.concat_tables(good)

    return ds.map_batches(safe, batch_format="pyarrow", batch_size=batch_size)
