"""RFM segmentation — the classic customer-analytics operator:
recency / frequency / monetary metrics per user, quartile-scored
against the corpus's own exact quantiles, rolled up to segment
counts ("R4F4M4" = best).

Shape: ONE user groupby builds the slim metric table (user_id + 3
int64 columns, materialized once); corpus max-ts is one driver
scalar; the three quartile fences come from the engine's exact
`quantiles.group_quantiles` (DuckDB ``quantile_cont``'s pinned float
shape) over a constant group — 9 broadcast scalars; scoring is a pure
map; the final segment rollup is a 64-key groupby.

The exact global quantile needs each metric's values in one task
(same contract as q_value_quantiles); the histogram variant
(`group_quantiles_hist`) is the documented 100 TB path if user
cardinality outgrows a task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DAY_US = 86_400 * 1_000_000
QS = {"p25": 0.25, "p50": 0.50, "p75": 0.75}


def _user_metrics(events_ds):
    from ray.data.aggregate import Count, Max, Sum

    def slim(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        us = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        cents = np.round(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {"user_id": pa.array(uid), "__us": pa.array(us), "__cents": pa.array(cents)}
        )

    return (
        events_ds.select_columns(["user_id", "ts", "value"])
        .map_batches(slim, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("__cents", alias_name="cents"),
            Max("__us", alias_name="last_us"),
        )
    )


def rfm_segments(events_ds):
    """events -> (segment, n_users), segment = 'R{1-4}F{1-4}M{1-4}'."""
    from ray.data.aggregate import Max as AMax
    from ray.data.aggregate import Sum

    from .quantiles import group_quantiles

    max_us = events_ds.select_columns(["ts"]).map_batches(
        lambda t: pa.table(
            {
                "us": pa.array(
                    [
                        int(
                            t.column("ts")
                            .to_numpy(zero_copy_only=False)
                            .astype("datetime64[us]")
                            .astype(np.int64)
                            .max()
                        )
                    ],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).max("us")

    metrics = _user_metrics(events_ds).map_batches(
        lambda t: t.append_column(
            "recency_days",
            pa.array(
                (max_us - t.column("last_us").to_numpy(zero_copy_only=False))
                // DAY_US
            ),
        ).append_column("__g", pa.array(np.zeros(len(t), np.int64))),
        batch_format="pyarrow",
    ).materialize()  # consumed by 3 quantile passes + the scoring map

    fences = {}
    for col in ("recency_days", "n_events", "cents"):
        row = group_quantiles(metrics, "__g", col, QS).take(1)[0]
        fences[col] = (row["p25"], row["p50"], row["p75"])

    def score(t: pa.Table) -> pa.Table:
        days = t.column("recency_days").to_numpy(zero_copy_only=False)
        n = t.column("n_events").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)

        def hi_good(v, f):  # >= p75 -> 4 ... < p25 -> 1
            return 1 + (v >= f[0]).astype(np.int64) + (v >= f[1]) + (v >= f[2])

        r = 1 + (
            (days <= fences["recency_days"][2]).astype(np.int64)
            + (days <= fences["recency_days"][1])
            + (days <= fences["recency_days"][0])
        )
        f = hi_good(n, fences["n_events"])
        m = hi_good(c, fences["cents"])
        seg = (
            "R"
            + pd.Series(r).astype(str)
            + "F"
            + pd.Series(f).astype(str)
            + "M"
            + pd.Series(m).astype(str)
        )
        return pa.table(
            {
                "segment": pa.array(seg.tolist(), pa.string()),
                "n_users": pa.array(np.ones(len(seg), np.int64)),
            }
        )

    return (
        metrics.map_batches(score, batch_format="pyarrow")
        .groupby("segment")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def rfm_sql(source: str = "events") -> str:
    """DuckDB mirror of :func:`rfm_segments`."""
    return (
        f"WITH rfm_m AS (SELECT user_id, count(*) AS n_events, "
        "sum(CAST(round(value * 100.0) AS BIGINT)) AS cents, "
        f"((SELECT max(epoch_us(ts)) FROM {source}) - max(epoch_us(ts))) "
        f"// {DAY_US} AS recency_days "
        f"FROM {source} GROUP BY user_id), "
        "rfm_q AS (SELECT "
        "quantile_cont(recency_days, 0.25) AS rp25, "
        "quantile_cont(recency_days, 0.50) AS rp50, "
        "quantile_cont(recency_days, 0.75) AS rp75, "
        "quantile_cont(n_events, 0.25) AS fp25, "
        "quantile_cont(n_events, 0.50) AS fp50, "
        "quantile_cont(n_events, 0.75) AS fp75, "
        "quantile_cont(cents, 0.25) AS mp25, "
        "quantile_cont(cents, 0.50) AS mp50, "
        "quantile_cont(cents, 0.75) AS mp75 FROM rfm_m), "
        "rfm_s AS (SELECT 'R' || CAST(1 + (recency_days <= rp75)::INT + "
        "(recency_days <= rp50)::INT + (recency_days <= rp25)::INT AS VARCHAR) "
        "|| 'F' || CAST(1 + (n_events >= fp25)::INT + (n_events >= fp50)::INT + "
        "(n_events >= fp75)::INT AS VARCHAR) "
        "|| 'M' || CAST(1 + (cents >= mp25)::INT + (cents >= mp50)::INT + "
        "(cents >= mp75)::INT AS VARCHAR) AS segment "
        "FROM rfm_m CROSS JOIN rfm_q) "
        "SELECT segment, CAST(count(*) AS BIGINT) AS n_users FROM rfm_s "
        "GROUP BY segment"
    )
