"""Golden end-to-end pipeline tests (SURVEY.md §5): the full ingest DAG
on fixtures — union-distinct-sort → enrich joins → upsert + append —
including upsert idempotence and append monotonicity, plus the
streaming flavor with checkpoint recovery."""

from __future__ import annotations

import pytest

from steam_data_pipeline_spark.operators.state import FileRunJournal
from steam_data_pipeline_spark.operators.upsert import ParquetTableStore
from steam_data_pipeline_spark.streaming.ingest import (
    DIM_TABLE,
    FACT_TABLE,
    gather_candidates,
    run_ingest_once,
    run_ingest_stream,
)


@pytest.fixture()
def store(spark, tmp_path):
    return ParquetTableStore(spark, str(tmp_path / "tables"))


class TestBatchIngest:
    def test_end_to_end_counts(self, spark, sf_dir, store):
        stats = run_ingest_once(spark, sf_dir, store)
        assert stats["pool"] > 0
        # dim rows = candidates that found details (partkeys ≤ 200 at sf0.001)
        assert 0 < stats["dim_rows"] <= stats["pool"]
        assert stats["fact_rows"] == stats["dim_rows"]

    def test_rerun_dim_stable_facts_grow(self, spark, sf_dir, store):
        """Upsert idempotence for the dimension; append monotonicity for
        the facts (main.py:451-457 / GUIDE:181-182)."""
        s1 = run_ingest_once(spark, sf_dir, store)
        s2 = run_ingest_once(spark, sf_dir, store)
        assert s2["dim_rows"] == s1["dim_rows"]
        assert s2["fact_rows"] == 2 * s1["fact_rows"]

    def test_lock_blocks_concurrent_run(self, spark, sf_dir, store, tmp_path):
        journal = FileRunJournal(str(tmp_path / "journal.json"))
        assert journal.acquire()  # someone else holds the lock
        stats = run_ingest_once(spark, sf_dir, store, journal=journal)
        assert stats == {"skipped": 1}

    def test_candidate_pool_sorted_strings(self, spark, sf_dir):
        pool = [r.app_id for r in gather_candidates(spark, sf_dir).collect()]
        assert pool == sorted(pool)  # lexicographic, not numeric (main.py:421)


class TestStreamIngest:
    def test_stream_upsert_and_append(self, spark, sf_dir, store, tmp_path):
        run_ingest_stream(spark, sf_dir, store, str(tmp_path / "ckpt"))
        dim = store.read(DIM_TABLE + "_stream")
        facts = store.read(FACT_TABLE + "_stream")
        n_keys = dim.count()
        assert n_keys > 0
        assert dim.select("app_id").distinct().count() == n_keys  # PK holds
        assert facts.count() > n_keys  # append kept every event

    def test_stream_restart_is_exactly_once(self, spark, sf_dir, store, tmp_path):
        """Restarting from the same checkpoint must not reprocess —
        the checkpoint-as-lock/journal property (SURVEY §2.8)."""
        ckpt = str(tmp_path / "ckpt")
        run_ingest_stream(spark, sf_dir, store, ckpt)
        facts_before = store.read(FACT_TABLE + "_stream").count()
        run_ingest_stream(spark, sf_dir, store, ckpt)  # no new files
        assert store.read(FACT_TABLE + "_stream").count() == facts_before


class TestBadInputs:
    def test_missing_sf_dir_raises_cleanly(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import AnalysisException

        from steam_data_pipeline_spark.sources.tables import read_table

        with pytest.raises((AnalysisException, Py4JJavaError, FileNotFoundError, OSError)):
            read_table(spark, "/root/testdata/sf-nope", "region").collect()

    def test_unknown_table_lists_valid_names(self, spark, sf_dir):
        from steam_data_pipeline_spark.sources.tables import read_table

        with pytest.raises(KeyError, match="region"):
            read_table(spark, sf_dir, "not_a_table")


class TestEventsTsUnitSniffing:
    """The driver regenerated events.parquet with different physical
    ts types across rounds (NANOS in r1-r2, MICROS in r3); the readers
    sniff the footer and must handle both."""

    def _write_events(self, tmp_path, unit):
        import pyarrow as pa
        import pyarrow.parquet as pq

        base_us = 1704067200_000_000  # 2024-01-01 UTC in micros
        ts = pa.array(
            [base_us * 1000 + i * 1_500_000_000 for i in range(4)]
            if unit == "ns"
            else [base_us + i * 1_500_000 for i in range(4)],
            type=pa.timestamp(unit),
        )
        table = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": ts,
                "user_id": pa.array([10, 10, 11, 11], pa.int64()),
                "event_type": pa.array(["a", "b", "a", "b"]),
                "value": pa.array([1.0, 2.0, 3.0, 4.0]),
                "props": pa.array(['{"k":1}'] * 4),
            }
        )
        d = tmp_path / f"sf-{unit}"
        d.mkdir()
        pq.write_table(table, str(d / "events.parquet"))
        return str(d)

    @pytest.mark.parametrize("unit", ["ns", "us"])
    def test_batch_reader_converts_both_units(self, spark, tmp_path, unit):
        from steam_data_pipeline_spark.sources.tables import read_table

        d = self._write_events(tmp_path, unit)
        rows = sorted(read_table(spark, d, "events").collect(), key=lambda r: r.event_id)
        assert [str(r.ts) for r in rows] == [
            "2024-01-01 00:00:00",
            "2024-01-01 00:00:01.500000",
            "2024-01-01 00:00:03",
            "2024-01-01 00:00:04.500000",
        ]
        assert rows[0].ts.year == 2024  # never the 1970 misread

    @pytest.mark.parametrize("unit", ["ns", "us"])
    def test_stream_reader_converts_both_units(self, spark, tmp_path, unit):
        from steam_data_pipeline_spark.sources.tables import read_events_stream

        d = self._write_events(tmp_path, unit)
        sdf = read_events_stream(spark, d)
        q = (
            sdf.writeStream.format("memory")
            .queryName(f"ts_unit_{unit}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = sorted(
            spark.table(f"ts_unit_{unit}").collect(), key=lambda r: r.event_id
        )
        spark.catalog.dropTempView(f"ts_unit_{unit}")
        assert rows[0].ts.year == 2024
        assert str(rows[1].ts) == "2024-01-01 00:00:01.500000"
