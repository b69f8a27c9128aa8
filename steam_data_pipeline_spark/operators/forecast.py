"""Grouped-map forecasting (SURVEY.md §2.9 ``udtf_forecast``; PLAN:71).

The reference plans per-game ARIMA/Prophet trend forecasts. Those libs
aren't available here, so the production-shaped surface is a
deterministic **linear trend** fit per key via ``applyInPandas``:
grouped-map, Arrow-batched, one pandas frame per key group — exactly
the execution shape an ARIMA fit would use; swap ``_fit_group``'s math
and nothing else changes.

Determinism discipline: x = 0..n-1 in (ts, event_id) order; all sums
are computed **exactly** (Python bigints over cent-scaled values —
the measure column is 2-dp by data contract), and only the final
closed-form expression runs in float64. Because every intermediate sum
is exact, the result is bit-identical to a SQL engine computing the
same closed form from exact DECIMAL sums — which is what the DuckDB
oracle for this operator does.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

FORECAST_SCHEMA = (
    "user_id long, n_obs long, slope double, intercept double, forecast_next double"
)


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    cents = [round(v * 100) for v in pdf["value"].tolist()]  # exact ints (2-dp data)
    n = len(cents)
    if n < 2:
        slope = 0.0
        intercept = cents[0] / 100 if n else 0.0
        forecast = intercept
    else:
        sx = n * (n - 1) // 2                      # Σx          (exact int)
        sxx = (n - 1) * n * (2 * n - 1) // 6       # Σx²         (exact int)
        sy = sum(cents) / 100                      # Σy   as correctly-rounded double
        sxy = sum(i * c for i, c in enumerate(cents)) / 100  # Σxy, same rounding
        # float64 closed form, same operation order as the SQL oracle:
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        forecast = intercept + slope * n
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_obs": [n],
            "slope": [slope],
            "intercept": [intercept],
            "forecast_next": [forecast],
        }
    )


def linear_forecast_per_key(events: DataFrame) -> DataFrame:
    """Per-key linear trend + one-step forecast over (ts, value).

    Scale posture: ``applyInPandas`` shuffles once on the key; each
    group must fit in executor memory — per-entity history, bounded in
    practice (the reference tracks ~1e3 games × 1 obs/day). For
    pathological keys, pre-aggregate to daily means first.
    """
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_fit_group, schema=FORECAST_SCHEMA)
    )
