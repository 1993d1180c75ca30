"""sf1.0-robustness evidence runner (VERDICT r4 #2): time the
heaviest queries at sf0.1 and at the 10x corpus
(tools/make_bigsf.py) in ONE session/host window, so the wall-time
ratio directly evidences sub-linear-in-rows-shuffled scaling. The
120M-doc flagship leg runs separately via
``GRAFT_BENCH_DOCS=120000000 GRAFT_SKIP_QUERIES=1 python bench.py``
(it synthesizes its own corpus).

Usage: python tools/bigsf_bench.py [--big /tmp/sfbig] [--queries ...]
Prints one JSON line; full detail to /tmp/bigsf_bench.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

HEAVY = [
    "q_curate_for_training",
    "q_collocations",
    "q_train_quality",
    "q_substring_dedup",
    "q_checkpoint_manifest",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_bloom_semi_join",
    "q_grid_clusters",
    "q_ann_pq_recall",
    "q_mutual_nn_recall",
    "q_manifest_counts",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", default="/tmp/sfbig")
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--queries", nargs="*", default=HEAVY)
    a = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=a.num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out: dict = {"num_cpus": a.num_cpus, "queries": {}}
    for name in a.queries:
        fn = qs[name]
        row: dict = {}
        for tag, sf_dir in (("small", a.small), ("big", a.big)):
            t0 = time.perf_counter()
            res = fn(sf_dir)
            import pandas as pd
            import pyarrow as _pa

            if isinstance(res, pd.DataFrame):
                n = len(res)
            elif isinstance(res, _pa.Table):
                n = res.num_rows
            else:
                n = res.count()
            row[f"{tag}_s"] = round(time.perf_counter() - t0, 2)
            row[f"{tag}_rows"] = int(n)
        row["ratio"] = round(row["big_s"] / max(row["small_s"], 1e-9), 2)
        out["queries"][name] = row
        print(name, row, flush=True)
    ratios = [r["ratio"] for r in out["queries"].values()]
    out["median_ratio"] = sorted(ratios)[len(ratios) // 2]
    with open("/tmp/bigsf_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "bigsf_ratio", "median_ratio": out["median_ratio"],
                      "n_queries": len(ratios)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
