"""Round-12 streaming-package module review (verdict item 7):
timer/clock edge cases in the scheduler gate, watermark boundary
off-by-ones, retry-schedule determinism and zero-attempt guards, and
the stateful Holt-Winters NULL-observation contract."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# scheduler clock edges
# ---------------------------------------------------------------------------


class TestSchedulerClockEdges:
    def test_naive_datetime_rejected(self):
        from steam_data_pipeline_spark.streaming.scheduler import next_run_at

        with pytest.raises(ValueError, match="timezone-aware"):
            next_run_at(datetime(2024, 3, 1, 12, 0))

    def test_bad_hour_rejected(self):
        from steam_data_pipeline_spark.streaming.scheduler import next_run_at

        now = datetime(2024, 3, 1, 12, 0, tzinfo=timezone.utc)
        for h in (-1, 24):
            with pytest.raises(ValueError, match="run_hour_utc"):
                next_run_at(now, run_hour_utc=h)

    def test_exactly_at_trigger_hour_schedules_tomorrow(self):
        """now == base is 'already passed' (runner.py:75): the gate
        must not double-fire on a run that lands exactly on the hour."""
        from steam_data_pipeline_spark.streaming.scheduler import next_run_at

        now = datetime(2024, 3, 1, 17, 0, 0, tzinfo=timezone.utc)
        nxt = next_run_at(now, run_hour_utc=17, jitter_seed=0)
        assert nxt.day == 2
        # one microsecond earlier still fires today
        nxt = next_run_at(
            now - timedelta(microseconds=1), run_hour_utc=17, jitter_seed=0
        )
        assert nxt.day == 1

    def test_jitter_bounds_and_nonlocal_tz(self):
        from steam_data_pipeline_spark.streaming.scheduler import next_run_at

        # a +9h zone: the gate must fire on the UTC hour, not the local
        tz9 = timezone(timedelta(hours=9))
        now = datetime(2024, 3, 1, 20, 0, tzinfo=tz9)  # == 11:00 UTC
        for seed in range(25):
            nxt = next_run_at(now, run_hour_utc=17, jitter_seed=seed)
            base = datetime(2024, 3, 1, 17, 0, tzinfo=timezone.utc)
            off = (nxt - base).total_seconds()
            assert 0 <= off <= 120 * 60

    def test_stop_during_run_finishes_run_and_exits(self):
        """Concurrent stop: a stop() landing DURING run_fn must let the
        run complete, then exit at the wait — never start another."""
        from steam_data_pipeline_spark.streaming.scheduler import (
            ScheduledRunner,
        )

        calls = []

        def run_fn():
            calls.append(1)
            runner.stop()  # SIGTERM arrives mid-run

        runner = ScheduledRunner(run_fn, jitter_seed=0)
        t0 = time.time()
        runs = runner.run_loop(max_runs=10)
        assert runs == 1 and len(calls) == 1
        assert time.time() - t0 < 5  # exited at the wait, not a day later

    def test_stop_before_loop_runs_nothing(self):
        from steam_data_pipeline_spark.streaming.scheduler import (
            ScheduledRunner,
        )

        runner = ScheduledRunner(lambda: pytest.fail("must not run"))
        runner.stop()
        assert runner.run_loop(max_runs=5) == 0


# ---------------------------------------------------------------------------
# retry: zero-attempt guards + per-batch schedule determinism
# ---------------------------------------------------------------------------


class TestRetryGuards:
    def test_call_with_retry_rejects_zero_attempts(self):
        from steam_data_pipeline_spark.streaming.retry import call_with_retry

        with pytest.raises(ValueError, match="max_retries"):
            call_with_retry(lambda: 1, max_retries=0)

    def test_foreach_batch_rejects_zero_attempts_at_wrap_time(self):
        from steam_data_pipeline_spark.streaming.retry import (
            retrying_foreach_batch,
        )

        with pytest.raises(ValueError, match="max_retries"):
            retrying_foreach_batch(lambda df, bid: None, max_retries=0)

    def test_schedule_identical_across_batches(self):
        """Seeded wrapper: every batch draws the SAME backoff schedule
        (the schedule is re-derived per batch from the seed, not
        consumed from shared RNG state a concurrent stop/restart could
        advance)."""
        from steam_data_pipeline_spark.streaming.retry import (
            retrying_foreach_batch,
        )

        slept: dict[int, list[float]] = {}
        attempts: dict[int, int] = {}

        def flaky(df, bid):
            attempts[bid] = attempts.get(bid, 0) + 1
            if attempts[bid] < 3:
                raise ConnectionError("sink hiccup")

        writer = retrying_foreach_batch(
            flaky,
            seed=7,
            fatal_fn=lambda e: False,
            sleep_fn=lambda s: slept.setdefault(cur[0], []).append(s),
        )
        cur = [0]
        writer(None, 0)
        cur = [1]
        writer(None, 1)
        assert slept[0] == slept[1] and len(slept[0]) == 2


# ---------------------------------------------------------------------------
# stateful Holt-Winters: NULL observations skip, never crash
# ---------------------------------------------------------------------------


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_hw_fold_skips_null_observations():
    """A NULL day in the streamed series must be SKIPPED (the batch
    fit's NULL-observation drop in operators/forecast.py) — int(NaN) used to
    kill the task. State after folding [v, NaN, v'] equals folding
    [v, v']."""
    from steam_data_pipeline_spark.streaming.stateful import _hw_fold

    vals = [100 + 7 * (i % 7) + i for i in range(20)]

    def run(series):
        state = _FakeState()
        pdf = pd.DataFrame(
            {"event_type": ["p"] * len(series),
             "day": range(len(series)), "cents": series}
        )
        out = list(_hw_fold(("p",), iter([pdf]), state))
        return state._v, out

    with_nan = vals[:10] + [float("nan")] + vals[10:]
    st_clean, out_clean = run([float(v) for v in vals])
    st_nan, out_nan = run(with_nan)
    assert st_clean == st_nan
    assert len(out_clean) == len(out_nan) == 1
    pd.testing.assert_frame_equal(out_clean[0], out_nan[0])


# ---------------------------------------------------------------------------
# watermark boundary: equal-to-watermark is NOT late
# ---------------------------------------------------------------------------


def test_watermark_boundary_equality_not_late(spark, tmp_path):
    """Pin the off-by-one at the watermark boundary: Spark drops a row
    only when its event time is STRICTLY below the effective watermark
    (max_event_time - delay); a row exactly AT the watermark must
    survive into its aggregate. A >= drop here would silently lose the
    newest on-time rows of every micro-batch at 100 TB."""
    d = str(tmp_path / "stream")
    os.makedirs(d)
    day = lambda h, m=0: datetime(2024, 3, 1, h, m)

    def write(path, rows):
        pd.DataFrame(rows, columns=["user_id", "ts", "value"]).to_parquet(
            path, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    # batch 1: max ts 04:00 → watermark advances to 03:00, which (per
    # the documented lag, see test_watermark_drops_late_rows) is in
    # effect for FILTERING two batches later
    write(f"{d}/b1.parquet", [(1, day(0, 10), 1.0), (1, day(4, 0), 1.0)])
    time.sleep(1.1)
    # batch 2: max unchanged (04:00 again) — lets the 03:00 watermark
    # propagate into effect without advancing it further
    write(f"{d}/b2.parquet", [(1, day(4, 0), 1.0)])
    time.sleep(1.1)
    # batch 3: filter watermark is now exactly 03:00 — one row AT it
    # (kept: not strictly below) and one strictly below (dropped);
    # 09:00 advances the watermark so later windows finalize
    write(f"{d}/b3.parquet", [
        (1, day(3, 0), 1.0),
        (1, datetime(2024, 3, 1, 2, 59, 59), 1.0),
        (1, day(9, 0), 1.0),
    ])
    time.sleep(1.1)
    # batch 4: push the watermark past every open window end
    write(f"{d}/b4.parquet", [(1, day(13, 0), 1.0)])

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_boundary")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {r["w"].start.hour: r["n"] for r in spark.table("wm_boundary").collect()}
    assert got.get(3) == 1, f"row AT the watermark must be kept: {got}"
    assert 2 not in got, f"row strictly below the watermark must drop: {got}"
    assert got.get(4) == 2, f"on-time rows must aggregate: {got}"
