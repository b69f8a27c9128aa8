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
