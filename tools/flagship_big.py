"""120M-doc flagship robustness leg (VERDICT r4 #2): run the real
benchmark flagship at 10x the artifact's doc count on one node,
prove it streams (no OOM, no driver materialization), and record
wall, docs/s, peak object-store usage and spill counters.

Usage: python tools/flagship_big.py [N_DOCS] [NUM_CPUS]
Prints one JSON line; object-store stats from Ray's own accounting.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from bench import run_flagship

    t0 = time.perf_counter()
    res = run_flagship(n_docs, "/tmp/flagship_big")
    wall = time.perf_counter() - t0

    mem = ""
    try:
        from ray._private.internal_api import memory_summary

        mem = memory_summary(stats_only=True)
    except Exception as ex:  # accounting is best-effort evidence
        mem = f"memory_summary unavailable: {ex!r}"
    spilled = restored = plasma = ""
    for line in mem.splitlines():
        low = line.strip()
        if low.startswith("Spilled"):
            spilled = low
        elif low.startswith("Restored"):
            restored = low
        elif "Plasma memory usage" in low:
            plasma = low
    print(
        json.dumps(
            {
                "metric": "flagship_big",
                "n_docs": n_docs,
                "num_cpus": num_cpus,
                "sec": round(res["sec"], 2),
                "docs_per_sec": round(res["docs_per_sec"], 1),
                "n_tiles": res["n_tiles"],
                "n_pip_rows": res["n_pip_rows"],
                "phases": res["phases"],
                "wall_total_s": round(wall, 2),
                "plasma": plasma,
                "spilled": spilled,
                "restored": restored,
            }
        )
    )
    with open("/tmp/flagship_big_mem.txt", "w") as f:
        f.write(mem)
    ray.shutdown()


if __name__ == "__main__":
    main()
