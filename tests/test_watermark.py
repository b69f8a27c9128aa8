"""Watermark / late-data semantics (SURVEY.md §2.8 stream_late_data):
rows arriving behind the event-time watermark are dropped from the
windowed aggregate; windows finalize (append-mode emission) only when
the watermark passes their end."""

from __future__ import annotations

import os
import time
from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F


def _write(path: str, rows: list[tuple[int, datetime, float]]) -> None:
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    pdf.to_parquet(path, index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)


def test_watermark_drops_late_rows(spark, tmp_path):
    d = str(tmp_path / "stream")
    os.makedirs(d)
    day = lambda h, m=0: datetime(2024, 3, 1, h, m)
    # batch 1: two rows in hour 0, then events advancing max ts to 04:00
    _write(f"{d}/b1.parquet", [
        (1, day(0, 10), 1.0),
        (1, day(0, 20), 1.0),
        (1, day(3, 0), 1.0),
        (1, day(4, 0), 1.0),
    ])
    time.sleep(1.1)
    # batch 2: advances the watermark pipeline (wm from batch 1 takes
    # effect for FILTERING one batch later — Spark's documented wm lag)
    _write(f"{d}/b2.parquet", [
        (1, day(5, 0), 1.0),
    ])
    time.sleep(1.1)
    # batch 3: a LATE row for hour 0 — the effective filter watermark is
    # now ≥ 03:00, so it must be dropped
    _write(f"{d}/b3.parquet", [
        (1, day(0, 30), 1.0),
        (1, day(6, 0), 1.0),
    ])

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
        .queryName("wm_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {
        r["w"].start.hour: r["n"]
        for r in spark.table("wm_t").collect()
    }
    assert got.get(0) == 2, f"late row must be dropped, got {got}"  # not 3
    assert got.get(3) == 1  # finalized once the watermark passed 04:00
    assert 6 not in got  # final window never passes the watermark


def _write_events(path: str, rows: list[tuple[int, datetime, int, str]]) -> None:
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    pdf.to_parquet(path, index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)


def test_stream_stream_left_join_late_and_outer_semantics(spark, tmp_path):
    """Outer stream-stream join watermark semantics (the registry's
    stream_stream_left_join shape — both sides watermarked 1 h, range
    condition e_ts in (p_ts, p_ts + 1 h]):

    1. an error arriving BEHIND the watermark must NOT join (no
       resurrection of an already-closed purchase window), and
    2. a purchase with no in-window error must emit null-padded
       EXACTLY ONCE, at watermark passage — not zero times, not per
       subsequent batch.

    Watermark timing (probed on this Spark): the global watermark
    computed at the END of batch N first applies DURING batch N+1, and
    within a batch inputs join BEFORE eviction runs — so a late row
    arriving in the same batch as the eviction pass still matches
    (process-then-evict). The genuine drop semantics therefore need
    the late row one batch AFTER the watermark crossed its partner's
    eviction threshold, which is the schedule below.

    Reference behavior: fetch-time event stamps (main.py:368)
    generalized to the alerting join; round-7 verdict item 5."""
    d = str(tmp_path / "ev")
    os.makedirs(d)
    t = lambda h, m=0: datetime(2024, 3, 1, h, m)
    # batch 1: matched pair (user 1) + an unmatched purchase (user 2)
    _write_events(f"{d}/b1.parquet", [
        (101, t(0, 10), 1, "purchase"),
        (201, t(0, 30), 1, "error"),
        (102, t(0, 20), 2, "purchase"),
    ])
    time.sleep(1.1)
    # batch 2: both legs advance to 05:00; the global watermark
    # becomes 04:00 at this batch's END
    _write_events(f"{d}/b2.parquet", [
        (998, t(5, 0), 3, "purchase"),
        (999, t(5, 0), 3, "error"),
    ])
    time.sleep(1.1)
    # batch 3: runs WITH watermark 04:00 -> purchase 102's state
    # (eviction threshold 01:20) is evicted here, emitting (102, null)
    _write_events(f"{d}/b3.parquet", [
        (997, t(6, 0), 3, "purchase"),
    ])
    time.sleep(1.1)
    # batch 4: the LATE error for user 2 (00:40 is inside 102's join
    # window but behind the 04:00 watermark, and 102's state is gone)
    # must be dropped — numRowsDroppedByWatermark, not a match
    _write_events(f"{d}/b4.parquet", [
        (202, t(0, 40), 2, "error"),
        (996, t(12, 0), 4, "purchase"),
        (995, t(12, 0), 4, "error"),
    ])

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    def leg(kind, cols):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
            .withWatermark("ts", "1 hour")
            .filter(F.col("event_type") == kind)
            .select(*cols)
        )

    left = leg("purchase", [
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    ])
    right = leg("error", [
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("e_id"),
    ])
    joined = left.join(
        right,
        F.expr("user_id = r_user_id AND e_ts > p_ts "
               "AND e_ts <= p_ts + interval 1 hour"),
        "leftOuter",
    ).select("user_id", "p_id", "e_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssloj_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ssloj"))
        .start()
    )
    q.awaitTermination()
    rows = [(r["p_id"], r["e_id"]) for r in spark.table("ssloj_wm").collect()]
    # matched pair present exactly once, never ALSO null-padded
    assert rows.count((101, 201)) == 1, rows
    assert (101, None) not in rows, rows
    # unmatched purchase emits null-padded exactly once at wm passage
    assert rows.count((102, None)) == 1, rows
    # the late error must not resurrect user 2's already-emitted row
    assert (102, 202) not in rows, rows
    assert all(e != 202 for _, e in rows), rows


def test_stream_stream_full_join_right_side_null_emissions(spark, tmp_path):
    """Full-outer stream-stream join watermark semantics — mirrors the
    left-join test above for the RIGHT side's null emissions (the
    registry's stream_stream_full_join shape, green r8 but previously
    only plan-contracted on this axis; round-8 verdict item 6):

    1. an orphan ERROR (no purchase in its preceding hour) must emit
       (null, e_id) EXACTLY ONCE, at watermark passage — the full
       join's addition over leftOuter;
    2. a purchase arriving BEHIND the watermark must NOT join the
       already-evicted orphan error (no resurrection), and must not
       itself produce a state-backed emission;
    3. matched pairs still emit exactly once with no null-padded
       duplicate on EITHER side.

    Same 4-batch schedule as the left test: wm from batch 2's end
    (04:00) first applies during batch 3, where both sides' stale
    state is evicted; the late row lands one batch later still."""
    d = str(tmp_path / "ev_full")
    os.makedirs(d)
    t = lambda h, m=0: datetime(2024, 3, 1, h, m)
    # batch 1: matched pair (user 1), unmatched purchase (user 2),
    # orphan error (user 7 — no purchase exists yet in its hour)
    _write_events(f"{d}/b1.parquet", [
        (101, t(0, 10), 1, "purchase"),
        (201, t(0, 30), 1, "error"),
        (102, t(0, 20), 2, "purchase"),
        (301, t(0, 30), 7, "error"),
    ])
    time.sleep(1.1)
    # batch 2: BOTH legs advance to 05:00 (the type filter is pushed
    # below each leg's watermark node, so each side's wm only advances
    # on its own event type); global wm = 04:00 at this batch's END
    _write_events(f"{d}/b2.parquet", [
        (998, t(5, 0), 3, "purchase"),
        (999, t(5, 0), 3, "error"),
    ])
    time.sleep(1.1)
    # batch 3: runs WITH wm 04:00 -> purchase 102 evicts to
    # (102, null); orphan error 301 evicts to (null, 301)
    _write_events(f"{d}/b3.parquet", [
        (997, t(6, 0), 5, "purchase"),
    ])
    time.sleep(1.1)
    # batch 4: the LATE purchase for user 7 (00:10 precedes error 301
    # inside the join hour, but is behind the 04:00 wm and 301's state
    # is gone) must be dropped, not matched, not emitted
    _write_events(f"{d}/b4.parquet", [
        (103, t(0, 10), 7, "purchase"),
        (996, t(12, 0), 4, "purchase"),
        (995, t(12, 0), 4, "error"),
    ])

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    def leg(kind, cols):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
            .withWatermark("ts", "1 hour")
            .filter(F.col("event_type") == kind)
            .select(*cols)
        )

    left = leg("purchase", [
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    ])
    right = leg("error", [
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("e_id"),
    ])
    joined = left.join(
        right,
        F.expr("user_id = r_user_id AND e_ts > p_ts "
               "AND e_ts <= p_ts + interval 1 hour"),
        "fullOuter",
    ).select("p_id", "e_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssfoj_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ssfoj"))
        .start()
    )
    q.awaitTermination()
    rows = [(r["p_id"], r["e_id"]) for r in spark.table("ssfoj_wm").collect()]
    # matched pair exactly once, null-padded on NEITHER side
    assert rows.count((101, 201)) == 1, rows
    assert (101, None) not in rows and (None, 201) not in rows, rows
    # left-side orphan still works under fullOuter
    assert rows.count((102, None)) == 1, rows
    # RIGHT-side orphan: error 301 emits (null, 301) exactly once
    assert rows.count((None, 301)) == 1, rows
    # the late purchase neither resurrects 301 nor joins anything
    assert (103, 301) not in rows, rows
    assert all(p != 103 for p, _ in rows), rows
