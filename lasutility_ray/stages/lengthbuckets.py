"""Sequence-length bucketing for training-batch planning: assign each
document to the smallest power-of-two token bucket that holds it
(ladder 16..4096, longer docs ride the top bucket) and roll up per
bucket the doc count, true token mass and the padding waste a
fixed-shape batcher would pay. The standard pre-tokenization audit
for "how much compute does padding burn at each max_len".

Shape: pure map-side partials (9-row ladder per batch) -> one tiny
single-key groupby — nothing corpus-sized ever shuffles. Token count
= the repo-wide whitespace-token convention (``\\S+`` runs, identical
RE2 semantics in pyarrow and DuckDB — the q_token_stats precedent).

Reference parity: extends the reference's per-tile occupancy counters
(LasUtility VoxelGrid statistics) to the corpus-batching axis.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LADDER = np.array([16, 32, 64, 128, 256, 512, 1024, 2048, 4096], dtype=np.int64)


def length_buckets(docs_ds, text_col: str = "text"):
    """(bucket, n_docs, sum_tokens, pad_waste): bucket = smallest
    ladder value >= n_tokens (top bucket holds everything longer, so
    its waste term is clamped at zero via LEAST(n, bucket))."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            t.column(text_col), r"\S+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        bi = np.searchsorted(LADDER, np.minimum(n, LADDER[-1]), side="left")
        b = LADDER[bi]
        waste = b - np.minimum(n, b)
        import pandas as pd

        agg = (
            pd.DataFrame({"bucket": b, "n": 1, "tok": n, "waste": waste})
            .groupby("bucket", sort=False)
            .agg(n=("n", "sum"), tok=("tok", "sum"), waste=("waste", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "bucket": pa.array(agg["bucket"].to_numpy(np.int64)),
                "n": pa.array(agg["n"].to_numpy(np.int64)),
                "tok": pa.array(agg["tok"].to_numpy(np.int64)),
                "waste": pa.array(agg["waste"].to_numpy(np.int64)),
            }
        )

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("tok", alias_name="sum_tokens"),
            Sum("waste", alias_name="pad_waste"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "bucket": t.column("bucket"),
                    "n_docs": t.column("n_docs").cast(pa.int64()),
                    "sum_tokens": t.column("sum_tokens").cast(pa.int64()),
                    "pad_waste": t.column("pad_waste").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def length_buckets_sql(source: str = "documents") -> str:
    """DuckDB mirror (literal CASE ladder — no float log2 anywhere)."""
    ladder = LADDER.tolist()
    cases = " ".join(
        f"WHEN n <= {b} THEN {b}" for b in ladder[:-1]
    )
    return (
        "WITH lb_n AS (SELECT "
        "length(regexp_extract_all(text, '\\S+')) AS n "
        f"FROM {source}), "
        f"lb_b AS (SELECT n, CAST(CASE {cases} ELSE {ladder[-1]} END "
        "AS BIGINT) AS bucket FROM lb_n) "
        "SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n) AS BIGINT) AS sum_tokens, "
        "CAST(sum(bucket - LEAST(n, bucket)) AS BIGINT) AS pad_waste "
        "FROM lb_b GROUP BY bucket"
    )
