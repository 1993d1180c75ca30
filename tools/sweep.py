"""Strict full-query sweep: run every `queries()` entry and compare
against its `oracle_sql()` mirror the way the driver does — sort
columns by name, sort rows, then demand EXACT dtype + value equality
of the resulting pandas frames (bitwise for floats, NaN==NaN).

This is deliberately STRICTER than tests/: a dtype divergence
(pandas Int64 vs duckdb float64, HUGEINT sums, int32 counters) that
a normalizing compare would forgive shows up here as the driver
would plausibly see it.

Usage:
    python tools/sweep.py                 # all queries at sf0.001
    python tools/sweep.py --sf sf0.01
    python tools/sweep.py q_bfs_hops q_frame_window
    python tools/sweep.py --first 50      # the driver window only
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    return df.sort_values(cols, kind="stable").reset_index(drop=True)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    for c in a.columns:
        da, db = str(a[c].dtype), str(b[c].dtype)
        if da != db:
            return False, f"dtype[{c}] {da} != {db}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        va, vb = a[c].to_numpy(), b[c].to_numpy()
        if va.dtype.kind == "f":
            same = (va == vb) | (np.isnan(va) & np.isnan(vb))
            if not same.all():
                i = int(np.flatnonzero(~same)[0])
                return False, f"value[{c}] row {i}: {va[i]!r} != {vb[i]!r}"
        else:
            neq = va != vb
            if getattr(neq, "any", None) and neq.any():
                i = int(np.flatnonzero(neq)[0])
                return False, f"value[{c}] row {i}: {va[i]!r} != {vb[i]!r}"
    return True, ""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="subset of query names")
    ap.add_argument("--sf", default="sf0.001")
    ap.add_argument("--first", type=int, default=0, help="only the first N")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    import duckdb

    sf_dir = f"/root/testdata/{args.sf}"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = entry.queries(), entry.oracle_sql()
    names = args.names or list(qs)
    if args.first:
        names = list(qs)[: args.first]
    n_pass = n_rows_only = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            out = qs[name](sf_dir)
            df = out.to_pandas() if hasattr(out, "to_pandas") else out
            if hasattr(df, "to_pandas"):  # pyarrow.Table
                df = df.to_pandas()
            if name not in sqls:
                n_rows_only += 1
                print(f"ROWS-ONLY {name}: {len(df)} rows  ({time.time()-t0:.1f}s)")
                continue
            ref = con.execute(sqls[name]).df()
            ok, why = frames_equal(canon(df), canon(ref))
            if ok:
                n_pass += 1
                print(f"PASS      {name}: {len(df)} rows  ({time.time()-t0:.1f}s)")
            else:
                n_fail += 1
                print(f"FAIL      {name}: {why}  ({time.time()-t0:.1f}s)")
        except Exception:
            n_fail += 1
            print(f"ERROR     {name}:")
            traceback.print_exc()
    print(f"\n{n_pass} pass / {n_rows_only} rows-only / {n_fail} fail")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
