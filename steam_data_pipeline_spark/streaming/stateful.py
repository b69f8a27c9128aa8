"""Custom stateful streaming operator: cross-batch gaps-and-islands.

The batch `win_islands` operator (PLAN:52 discount sessionization)
assumes the full history is visible. In a live ingest the series
arrives in micro-batches, and an island may span batch boundaries —
Spark has no built-in for this, so it is the textbook case for
``applyInPandasWithState`` (SURVEY.md §2.8): per-key state carries the
*open* island (start/end/count/last flag) across batches; islands are
emitted append-mode the moment they close.

Equivalence contract (tested): over any batch decomposition that
respects per-key time order, the emitted closed islands equal the
batch operator's islands minus each key's final (still-open) island.

State size: O(1) per key — start/end timestamps and two counters —
the kind of state the state store scales to millions of keys with.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, island_id long, start_ts timestamp, end_ts timestamp, n_obs long"
)
# (next_island_id, open_start_us, open_end_us, open_n)
STATE_SCHEMA = "island_seq long, open_start long, open_end long, open_n long"

_US = 1_000_000


def _islands_fold(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        island_seq, open_start, open_end, open_n = state.get
    else:
        island_seq, open_start, open_end, open_n = 0, None, None, 0

    closed: list[tuple[int, int, int, int]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        # datetime64[us] first: Arrow→pandas yields ns-resolution today,
        # but pandas 2 frames can carry us-resolution timestamps, where a
        # bare astype("int64")//1000 would silently be 1000x off
        ts_us_arr = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        for ts_us, flag in zip(
            ts_us_arr.tolist(),
            (pdf["value"] > 100).tolist(),
        ):
            if flag:
                if open_n == 0:
                    island_seq += 1
                    open_start, open_end, open_n = ts_us, ts_us, 1
                else:
                    open_end, open_n = ts_us, open_n + 1
            else:
                if open_n > 0:
                    closed.append((island_seq, open_start, open_end, open_n))
                    open_start, open_end, open_n = None, None, 0

    state.update((island_seq, open_start, open_end, open_n))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "island_id": [c[0] for c in closed],
                "start_ts": [pd.Timestamp(c[1] * 1000) for c in closed],
                "end_ts": [pd.Timestamp(c[2] * 1000) for c in closed],
                "n_obs": [c[3] for c in closed],
            }
        )


def streaming_islands(events: DataFrame) -> DataFrame:
    """Append-mode stream of CLOSED flag-islands per key.

    ``events`` is a streaming DataFrame with (user_id, event_id, ts,
    value); batches must be per-key time-ordered (true for time-ordered
    file arrival / kafka per-key ordering), and ``ts`` must be
    non-NULL — it is the ordering spine (the batch twin sorts NULLS
    FIRST where pandas sorts NaT last, so NULL-ts input is out of
    contract for the equivalence guarantee; a NULL VALUE is in
    contract and closes the island, same as the batch operator's
    when(flag,1).otherwise(0)).
    """
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _islands_fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# streaming Holt-Winters: a real forecasting model as custom stream state
# ---------------------------------------------------------------------------

HW_OUTPUT_SCHEMA = (
    "event_type string, n_days long, h int, forecast_cents double"
)
# warmup buffer (first 14 observations, -1 = empty) + smoothing state;
# flat longs/doubles keep the state struct trivially Arrow-serializable
HW_STATE_SCHEMA = (
    "n long, lv double, tr double, "
    + ", ".join(f"s{i} double" for i in range(1, 8))
    + ", "
    + ", ".join(f"b{i} long" for i in range(1, 15))
)

_HW_A, _HW_1A = 0.3, 0.7
_HW_B, _HW_1B = 0.1, 0.9
_HW_G, _HW_1G = 0.2, 0.8


def _hw_fold(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key additive Holt-Winters fold. The float expressions are
    VERBATIM the batch operator's (operators/forecast.py
    ``_fit_hw_group``), and the week-2 observations are replayed
    through the recursion at init time exactly as the batch init does
    — so after any day-ordered batch decomposition the state equals
    the batch trajectory bit-for-bit."""
    if state.exists:
        st = list(state.get)
    else:
        st = [0, 0.0, 0.0] + [0.0] * 7 + [-1] * 14
    n = st[0]
    lv, tr = st[1], st[2]
    s = st[3:10]
    buf = st[10:24]

    def step(v: int) -> None:
        nonlocal lv, tr, s
        lp, tp = lv, tr
        lv = _HW_A * (v - s[0]) + _HW_1A * (lp + tp)
        tr = _HW_B * (lv - lp) + _HW_1B * tp
        s = s[1:] + [_HW_G * (v - lv) + _HW_1G * s[0]]

    for pdf in pdfs:
        # same NULL-observation drop as the batch fit (the dropna in
        # operators/forecast.py): a NULL day carries no information, and
        # int(NaN) would kill the task instead of skipping the row
        # (round-12 streaming module review). The batch fold replays
        # non-NULL observations in day order, so equivalence holds.
        pdf = pdf.dropna(subset=["cents"]).sort_values("day")
        for v in [int(x) for x in pdf["cents"].tolist()]:
            n += 1
            if n <= 14:
                buf[n - 1] = v
                if n == 14:
                    sum1, sum2 = sum(buf[:7]), sum(buf[7:14])
                    lv = sum1 / 7.0
                    tr = (sum2 / 7.0 - sum1 / 7.0) / 7.0
                    s = [buf[i] - lv for i in range(7)]
                    for t in range(7, 14):
                        step(buf[t])
            else:
                step(v)

    state.update(tuple([n, lv, tr] + list(s) + list(buf)))
    if n >= 15:
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * 7,
                "n_days": [n] * 7,
                "h": list(range(1, 8)),
                "forecast_cents": [
                    round(lv + h * tr + s[h - 1], 3) for h in range(1, 8)
                ],
            }
        )


def streaming_holt_winters(daily: DataFrame) -> DataFrame:
    """Append-mode per-batch Holt-Winters forecasts over a streaming
    daily series ``(event_type, day, cents)``; batches must arrive
    day-ordered per key (time-ordered file landing). Each batch emits
    the CURRENT 7-day forecast tagged with ``n_days`` — the live
    forecast a dashboard reads mid-stream; the final batch's rows
    equal the batch operator's output exactly."""
    return (
        daily.select("event_type", "day", "cents")
        .groupBy("event_type")
        .applyInPandasWithState(
            _hw_fold,
            outputStructType=HW_OUTPUT_SCHEMA,
            stateStructType=HW_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
