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

from pyspark.sql import DataFrame, functions as F

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


SEASONAL_SCHEMA = (
    "user_id long, n_obs long, phi double, season_next double, "
    "forecast_next double"
)

#: seasonal period (positions, i.e. observation index mod PERIOD) — 7
#: models the weekly cycle of the reference's daily player counts.
PERIOD = 7


def _fit_seasonal_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Seasonal-mean + AR(1) fit, PLAN:71's 'ARIMA-shaped' upgrade.

    Model: per-phase (x mod 7) seasonal means, plus a Yule-Walker AR(1)
    coefficient over the full series; forecast =
    ``m[next phase] + phi·(y_last − m[last phase])``.

    Exact-arithmetic discipline (same as :func:`_fit_group`): every SUM
    is a Python bigint over cent-scaled values, so the float closed
    form sees bit-identical inputs however Spark partitions, and the
    DuckDB oracle mirrors the same operation order over HUGEINT sums.
    Yule-Walker with the sample mean cleared of denominators:
    ``phi = (n²·C01 − n·S·(Sa+Sb) + (n−1)·S²) / (n²·Q − n·S²)``
    with C01 = Σ c_t·c_{t−1}, Sa/Sb the lag/lead sums, Q = Σ c_t².
    """
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    cents = [round(v * 100) for v in pdf["value"].tolist()]
    n = len(cents)
    S = sum(cents)
    mu = float(S) / 100.0 / n if n else 0.0
    # per-phase exact sums
    ph_n = [0] * PERIOD
    ph_s = [0] * PERIOD
    for i, c in enumerate(cents):
        ph_n[i % PERIOD] += 1
        ph_s[i % PERIOD] += c

    def phase_mean(p: int) -> float:
        if ph_n[p] == 0:
            return mu
        return float(ph_s[p]) / 100.0 / ph_n[p]

    if n < 2:
        phi = 0.0
    else:
        Q = sum(c * c for c in cents)
        C01 = sum(cents[i] * cents[i - 1] for i in range(1, n))
        Sa = S - cents[-1]  # Σ c_t over t=0..n-2
        Sb = S - cents[0]   # Σ c_t over t=1..n-1
        num = n * n * C01 - n * S * (Sa + Sb) + (n - 1) * S * S
        den = n * n * Q - n * S * S
        phi = 0.0 if den == 0 else float(num) / float(den)
    m_next = phase_mean(n % PERIOD)
    m_last = phase_mean((n - 1) % PERIOD) if n else mu
    y_last = float(cents[-1]) / 100.0 if n else 0.0
    forecast = m_next + phi * (y_last - m_last)
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_obs": [n],
            "phi": [phi],
            "season_next": [m_next],
            "forecast_next": [forecast],
        }
    )


def seasonal_ar_forecast_per_key(events: DataFrame) -> DataFrame:
    """Per-key seasonal-mean + AR(1) forecast — same per-partition
    grouped-map shape as :func:`linear_forecast_per_key`; only the
    per-group math differs. Scale posture identical: per-entity history
    bounded; pre-aggregate pathological keys to daily means first."""
    from steam_data_pipeline_spark.operators.grouped import sorted_grouped_map

    return sorted_grouped_map(
        # NULL observations carry no fit information and round(NaN*100)
        # crashes the exact-cents path — drop them on BOTH legs (the
        # oracles filter value IS NOT NULL); a key that is all-NULL
        # disappears entirely, consistently (round-11 module review).
        # |value| < 1e16 is the fit's measure domain (r12 extremes
        # contract): round(inf*100) crashes Python, and 1e16 is the
        # DECIMAL(18,2) bound the oracles sum under — out-of-domain
        # observations drop exactly like NULLs.
        events.select("user_id", "event_id", "ts", "value").filter(
            F.col("value").isNotNull() & (F.abs("value") < F.lit(1e16))
        ),
        keys=["user_id"],
        order=["ts", "event_id"],
        fn=_fit_seasonal_group,
        schema=SEASONAL_SCHEMA,
    )


def linear_forecast_per_key(events: DataFrame) -> DataFrame:
    """Per-key linear trend + one-step forecast over (ts, value).

    Runs through ``operators.grouped.sorted_grouped_map`` (key-
    clustered sorted partitions + one MapInPandas) rather than
    ``applyInPandas``: the entity-key grain means MANY SMALL GROUPS,
    and applyInPandas pays a measured ~4 ms/group fixed Python cost
    that dwarfs the closed-form fit itself. Each group must fit in
    executor memory — per-entity history, bounded in practice (the
    reference tracks ~1e3 games × 1 obs/day). For pathological keys,
    pre-aggregate to daily means first.
    """
    from steam_data_pipeline_spark.operators.grouped import sorted_grouped_map

    return sorted_grouped_map(
        # same NULL-observation + measure-domain drop as the seasonal
        # fit (see above)
        events.select("user_id", "event_id", "ts", "value").filter(
            F.col("value").isNotNull() & (F.abs("value") < F.lit(1e16))
        ),
        keys=["user_id"],
        order=["ts", "event_id"],
        fn=_fit_group,
        schema=FORECAST_SCHEMA,
    )


HW_SCHEMA = (
    "event_type string, h int, forecast_cents double, "
    "level double, trend double"
)

# pinned literals — the same constants appear VERBATIM in the DuckDB
# oracle; (1-alpha) etc. are written as their literal values (0.7, 0.9,
# 0.8) in both engines so the float expression trees are identical
_HW_ALPHA, _HW_1MA = 0.3, 0.7
_HW_BETA, _HW_1MB = 0.1, 0.9
_HW_GAMMA, _HW_1MG = 0.2, 0.8
_HW_M = 7


def _fit_hw_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Additive Holt-Winters over one key's observed-day series.

    Classic init: level = mean of week 1, trend = (mean week 2 - mean
    week 1)/7, seasonals = week-1 deviations; recursion consumes
    observations 8..n (week 2 is reused by both the trend init and
    smoothing — the standard textbook variant). Inputs are exact
    integer cents; every float op is written in the same order as the
    oracle's recursive CTE, so the state trajectory is bit-identical.
    """
    pdf = pdf.sort_values("day")
    x = [int(v) for v in pdf["cents"].tolist()]
    n = len(x)
    m = _HW_M
    if n < 2 * m + 1:
        return pd.DataFrame(
            columns=["event_type", "h", "forecast_cents", "level", "trend"]
        )
    sum1, sum2 = sum(x[:m]), sum(x[m : 2 * m])
    lv = sum1 / 7.0
    tr = (sum2 / 7.0 - sum1 / 7.0) / 7.0
    s = [x[i] - lv for i in range(m)]
    for t in range(m, n):
        lp, tp = lv, tr
        lv = _HW_ALPHA * (x[t] - s[0]) + _HW_1MA * (lp + tp)
        tr = _HW_BETA * (lv - lp) + _HW_1MB * tp
        s = s[1:] + [_HW_GAMMA * (x[t] - lv) + _HW_1MG * s[0]]
    et = pdf["event_type"].iloc[0]
    return pd.DataFrame(
        [
            (
                et,
                h,
                round(lv + h * tr + s[h - 1], 3),
                round(lv, 3),
                round(tr, 3),
            )
            for h in range(1, m + 1)
        ],
        columns=["event_type", "h", "forecast_cents", "level", "trend"],
    )


def holt_winters_per_key(daily: DataFrame) -> DataFrame:
    """7-day additive Holt-Winters forecast per key over a daily
    series ``(event_type, day, cents)`` — grouped-map ``applyInPandas``
    (one shuffle on the key, each group a sequential O(n) smoothing
    pass; the win_ewma_recursive skew note applies: one pathological
    key serializes only ITS history)."""
    return daily.groupBy("event_type").applyInPandas(
        _fit_hw_group, schema=HW_SCHEMA
    )
