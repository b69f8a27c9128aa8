"""Read/trigger API surface (reference EP2/EP3, main.py:499-537).

The reference exposes three FastAPI endpoints; their semantics — not
the HTTP plumbing — are the engine surface:

* ``GET /``               → health/status payload       (main.py:505-512 area)
* ``GET /games``          → first-5 dimension sample    (main.py:514-523)
* ``GET /trigger-scrape`` → async pipeline kick-off,
  lock-guarded                                          (main.py:530-537)

Here they are plain functions over the table store + run journal, with
the background-task semantics of EP2 mapped to a daemon thread (in a
real deployment: a job-server submit of an ``availableNow`` run).
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession

from steam_data_pipeline_spark.operators.state import FileRunJournal
from steam_data_pipeline_spark.operators.upsert import ParquetTableStore
from steam_data_pipeline_spark.streaming.ingest import DIM_TABLE, FACT_TABLE, run_ingest_once


def health(store: ParquetTableStore) -> dict:
    """Status payload: table existence + row counts (the GUIDE:181-182
    verification queries as an endpoint)."""
    out = {"status": "ok", "tables": {}}
    for table in (DIM_TABLE, FACT_TABLE):
        df = store.read(table)
        out["tables"][table] = None if df is None else df.count()
    return out


def read_games_sample(store: ParquetTableStore, n: int = 5) -> list[dict]:
    """First-n dimension sample (main.py:514-523), deterministic by key
    order; the reference's empty-table fallback becomes an empty list
    + message field handled by the caller."""
    df = store.read(DIM_TABLE)
    if df is None:
        return []
    return [r.asDict() for r in df.orderBy("app_id").limit(n).collect()]


def trigger_ingest(
    spark: SparkSession,
    sf_dir: str,
    store: ParquetTableStore,
    journal: FileRunJournal,
    background: bool = True,
):
    """EP2: kick off a pipeline run; respond immediately, run in the
    background; overlapping-run protection comes only from the lock
    (main.py:530-537 + 387-404)."""
    if background:
        t = threading.Thread(
            target=run_ingest_once,
            args=(spark, sf_dir, store, journal),
            daemon=True,
        )
        t.start()
        return {"accepted": True, "thread": t}
    return run_ingest_once(spark, sf_dir, store, journal=journal)
