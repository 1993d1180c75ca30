"""Grouped OLS regression (per-user spend trend) via exact integer
moments.

``user_trend`` fits y = a + b·x per user over (x = event day,
y = value in integer cents) and emits both the EXACT closed-form
rationals and the derived floats:

- ``slope_num``  = n·Σxy − Σx·Σy          (int64, exact)
- ``slope_den``  = n·Σx² − (Σx)²          (int64, exact)
- ``slope``      = slope_num / slope_den   (one IEEE division)
- ``intercept``  = (Σy − slope·Σx) / n     (fixed operand order)
- ``corr``       = slope_num / sqrt(dx·dy) (Pearson r)

Cross-engine exactness: the five moments are integer sums —
associative, partition-independent — so the rationals are
bit-identical to the SQL mirror by construction. The float columns
are single expressions evaluated on the SAME int64 operands in the
SAME order in both engines (int64→double conversion is IEEE
round-to-nearest in both, deterministic even past 2^53), so they
match bitwise too. Degenerate groups (all x equal, or constant y for
``corr``) yield NULL in SQL and NaN here — both land as float64 NaN
on the driver surface.

Overflow bound (documented, asserted nowhere hot): with |x| ≤ 2e4
(epoch days), |y| ≤ 1e6 (cents) the worst term n·Σy² stays inside
int64 for n ≤ 9e6 rows per group — far above any per-user count; at
a scale where one group exceeds that, shift x/y to group-local
offsets first.

100 TB shape: map-side partials collapse each batch to one row per
distinct user before the ONE shuffle (groupby user over the slim
7-int64-column moment table); the derived columns are a pure map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

US_PER_DAY = 86_400_000_000


def user_trend(events_ds):
    """events -> one row per user: (user_id, n, slope_num, slope_den,
    slope, intercept, corr)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // US_PER_DAY
        )
        y = np.round(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "user_id": uid,
                "n": np.ones(len(uid), np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sx2": x * x,
                "sy2": y * y,
            }
        )
        out = df.groupby("user_id", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    moments = (
        events_ds.select_columns(["user_id", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sx2", alias_name="sx2"),
            Sum("sy2", alias_name="sy2"),
        )
    )

    def derive(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        sx = t.column("sx").to_numpy(zero_copy_only=False).astype(np.int64)
        sy = t.column("sy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False).astype(np.int64)
        sx2 = t.column("sx2").to_numpy(zero_copy_only=False).astype(np.int64)
        sy2 = t.column("sy2").to_numpy(zero_copy_only=False).astype(np.int64)
        num = n * sxy - sx * sy
        den = n * sx2 - sx * sx
        dy = n * sy2 - sy * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(
                den > 0, num.astype(np.float64) / den.astype(np.float64), np.nan
            )
            intercept = np.where(
                den > 0,
                (sy.astype(np.float64) - slope * sx.astype(np.float64))
                / n.astype(np.float64),
                np.nan,
            )
            corr = np.where(
                (den > 0) & (dy > 0),
                num.astype(np.float64)
                / np.sqrt(den.astype(np.float64) * dy.astype(np.float64)),
                np.nan,
            )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n": pa.array(n),
                "slope_num": pa.array(num),
                "slope_den": pa.array(den),
                "slope": pa.array(slope, pa.float64()),
                "intercept": pa.array(intercept, pa.float64()),
                "corr": pa.array(corr, pa.float64()),
            }
        )

    return moments.map_batches(derive, batch_format="pyarrow")


def user_trend_sql(source: str = "events") -> str:
    """DuckDB mirror of :func:`user_trend` (same epoch-day x, cent y,
    same operand order in every float expression; epoch_us is
    positive so duckdb's truncating ``//`` equals python floor)."""
    return (
        "WITH tr_e AS (SELECT user_id, "
        f"epoch_us(ts) // {US_PER_DAY} AS x, "
        f"CAST(round(value*100) AS BIGINT) AS y FROM {source}), "
        "tr_m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
        "CAST(sum(x*y) AS BIGINT) AS sxy, "
        "CAST(sum(x*x) AS BIGINT) AS sx2, "
        "CAST(sum(y*y) AS BIGINT) AS sy2 FROM tr_e GROUP BY 1) "
        "SELECT user_id, n, "
        "n*sxy - sx*sy AS slope_num, "
        "n*sx2 - sx*sx AS slope_den, "
        "CASE WHEN n*sx2 - sx*sx > 0 THEN "
        "CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sx2 - sx*sx AS DOUBLE) "
        "END AS slope, "
        "CASE WHEN n*sx2 - sx*sx > 0 THEN "
        "(CAST(sy AS DOUBLE) - (CAST(n*sxy - sx*sy AS DOUBLE) / "
        "CAST(n*sx2 - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE)) "
        "/ CAST(n AS DOUBLE) END AS intercept, "
        "CASE WHEN n*sx2 - sx*sx > 0 AND n*sy2 - sy*sy > 0 THEN "
        "CAST(n*sxy - sx*sy AS DOUBLE) / "
        "sqrt(CAST(n*sx2 - sx*sx AS DOUBLE) * CAST(n*sy2 - sy*sy AS DOUBLE)) "
        "END AS corr "
        "FROM tr_m"
    )
