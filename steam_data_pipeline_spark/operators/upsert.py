"""Upsert (MERGE) and append sinks (SURVEY.md §2.1 sinks; main.py:451-475).

The reference's write path is:

* ``sink_upsert_metadata`` — ``INSERT … ON CONFLICT (app_id) DO UPDATE``
  (main.py:451-457): last-writer-wins per key, idempotent re-runs.
* ``sink_append_timeseries`` — bulk append (main.py:475).

Spark has no in-place update on plain parquet, so MERGE is expressed as
a *logical* transformation plus an atomic table swap:

    merged = dedup(new) ∪ (old ⟂anti new)        # logical MERGE
    write merged → staging dir; atomic rename     # physical commit

On a real deployment this is exactly Delta/Iceberg ``MERGE INTO``; the
logical half is identical and is what the correctness oracle checks.
The physical half (``ParquetTableStore``) gives crash-safe,
generation-versioned swaps good enough for a single writer — the same
guarantee the reference gets from its DB lock (main.py:387-404).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from steam_data_pipeline_spark.operators.relational import dedup_last_writer


def merge_upsert(
    old: DataFrame | None,
    new: DataFrame,
    key: str,
    version_cols: list | None = None,
) -> DataFrame:
    """Logical MERGE: rows of ``new`` (deduped last-writer-wins per key)
    plus rows of ``old`` whose key is absent from ``new``.

    * update half  ≡ new rows replacing matching old keys
    * insert half  ≡ new keys (anti-join shape, main.py:452-455)
    * idempotence  ≡ merge(merge(T, B), B) == merge(T, B)

    The anti join broadcasts the *keys* of ``new`` when small; at scale
    AQE picks the strategy. One shuffle on the key either way.
    """
    if version_cols:
        new = dedup_last_writer(new, key, version_cols)
    else:
        new = new.dropDuplicates([key])
    if old is None:
        return new
    keep_old = old.join(new.select(key), on=key, how="left_anti")
    return new.unionByName(keep_old)


class ParquetTableStore:
    """Generation-versioned parquet tables with atomic swap.

    Layout:  <root>/<table>/gen=<n>/part-*.parquet plus a tiny
    ``_CURRENT`` pointer file. Readers resolve the pointer then read one
    immutable generation; the writer stages the next generation fully
    before flipping the pointer (single ``os.replace`` — atomic on
    POSIX). This mirrors a table-format commit protocol in miniature
    and gives upsert idempotence across crashes: a died-before-flip
    writer leaves the old generation intact.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_CURRENT")

    def current_path(self, table: str) -> str | None:
        ptr = self._pointer(table)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            gen = f.read().strip()
        path = os.path.join(self._tdir(table), gen)
        return path if os.path.exists(path) else None

    def read(self, table: str) -> DataFrame | None:
        path = self.current_path(table)
        if path is None:
            return None
        return self.spark.read.parquet(path)

    def overwrite(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Write a full new generation and atomically flip the pointer."""
        os.makedirs(self._tdir(table), exist_ok=True)
        gen = f"gen={uuid.uuid4().hex[:12]}"
        out = os.path.join(self._tdir(table), gen)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(gen)
        old = self.current_path(table)
        os.replace(tmp, self._pointer(table))
        if old is not None and os.path.abspath(old) != os.path.abspath(out):
            shutil.rmtree(old, ignore_errors=True)

    def upsert(
        self,
        table: str,
        new: DataFrame,
        key: str,
        version_cols: list | None = None,
    ) -> None:
        """MERGE ``new`` into the stored table (sink_upsert_metadata)."""
        merged = merge_upsert(self.read(table), new, key, version_cols)
        self.overwrite(table, merged)

    def append(self, table: str, df: DataFrame) -> None:
        """Append-only fact sink (sink_append_timeseries, main.py:475).

        Parquet append is file-level atomic; each micro-batch adds files
        without touching existing ones.
        """
        cur = self.current_path(table)
        if cur is None:
            self.overwrite(table, df)
        else:
            df.write.mode("append").parquet(cur)

    def append_timeseries(self, table: str, df: DataFrame, key: str = "app_id", ts: str = "timestamp") -> None:
        """Append with the reference's access-path layout: the composite
        index (app_id, timestamp) (main.py:102-105) becomes
        repartition-by-key + sort-within-partitions — per-key history
        scans and window functions then run shuffle-free."""
        laid_out = df.repartition(F.col(key)).sortWithinPartitions(key, ts)
        self.append(table, laid_out)


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist a table hash-bucketed by its join key (Hive-style
    bucketing via ``saveAsTable``).

    Two tables bucketed the same way join with ZERO exchange on either
    side — the physical co-location the reference approximates with its
    composite index (main.py:102-105), and the standard answer to the
    repeated dim⋈fact join at 100 TB: pay the shuffle once at write
    time, never at read time. Verified by the plan-contract test
    (no Exchange in the bucketed join plan).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.format("parquet").saveAsTable(table_name)
