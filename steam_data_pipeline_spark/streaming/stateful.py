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
        for ts_us, flag in zip(
            (pdf["ts"].astype("int64") // 1000).tolist(),  # ns → µs
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
    file arrival / kafka per-key ordering).
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
