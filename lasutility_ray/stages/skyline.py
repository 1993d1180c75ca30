"""Distributed 2-D skyline (Pareto front) — the classic "best
trade-off" query: orders that no other order dominates (higher-or-
equal price AND earlier-or-equal date, strictly better in one).

The skyline operator is ASSOCIATIVE in exactly the way Ray Data
wants: every global skyline point survives its own block's local
skyline (no row in another block can eliminate it locally), so

    skyline(T) = skyline( union of per-block skylines )

and the plan is one `map_batches` (per-block vectorized scan, output
~O(log n) rows per block in expectation) followed by one tiny final
merge task over the concatenated partials — no all-to-all shuffle,
no driver loop, shuffle volume ~ blocks x skyline size.

Exactness: the two dimensions are integer cents and integer epoch
microseconds; ties are resolved on DISTINCT (price, date) points
(among equal prices only the earliest date can be non-dominated), so
the result set is unique and the DuckDB mirror reproduces it with a
GROUP BY + one running-min window over the price-descending order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _scan(p: np.ndarray, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Skyline of distinct (p, d) points: maximize p, minimize d.
    Reduce to per-p min d, sort p descending, keep rows strictly
    below the running minimum of all earlier (higher-p) dates."""
    order = np.lexsort((d, -p))
    p, d = p[order], d[order]
    first = np.empty(len(p), dtype=bool)
    if len(p):
        first[0] = True
        first[1:] = p[1:] != p[:-1]
    p, d = p[first], d[first]  # per-price min date (d ascending in ties)
    if not len(p):
        return p, d
    rm = np.minimum.accumulate(d)
    keep = np.empty(len(p), dtype=bool)
    keep[0] = True
    keep[1:] = d[1:] < rm[:-1]
    return p[keep], d[keep]


def skyline_orders(orders_ds):
    """orders -> (price_cents, date_us) skyline points (max price,
    min date), value-exact and deterministic."""

    def partial(t: pa.Table) -> pa.Table:
        p = np.round(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d = (
            t.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        p, d = _scan(p, d)
        return pa.table(
            {
                "price_cents": pa.array(p, pa.int64()),
                "date_us": pa.array(d, pa.int64()),
                "__one": pa.array(np.zeros(len(p), np.int64)),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        p, d = _scan(
            g["price_cents"].to_numpy(np.int64), g["date_us"].to_numpy(np.int64)
        )
        return pd.DataFrame({"price_cents": p, "date_us": d})

    return (
        orders_ds.select_columns(["o_totalprice", "o_orderdate"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__one")
        .map_groups(final, batch_format="pandas")
    )


def skyline_orders_sql(source: str = "orders") -> str:
    """DuckDB mirror of :func:`skyline_orders`."""
    return (
        "WITH sk_p AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS p, "
        f"epoch_us(o_orderdate) AS d FROM {source}), "
        "sk_m AS (SELECT p, min(d) AS d FROM sk_p GROUP BY p), "
        "sk_w AS (SELECT p, d, min(d) OVER (ORDER BY p DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM sk_m) "
        "SELECT p AS price_cents, d AS date_us FROM sk_w "
        "WHERE pm IS NULL OR d < pm"
    )
