"""Reference-faithful behavior tests: the steam-shaped appdetails
flatten (main.py:296-313), the scheduler gate/jitter/graceful-stop
(runner.py), and the API surface (EP2/EP3)."""

from __future__ import annotations

import json
import threading
import time
from datetime import datetime, timezone
from decimal import Decimal

import pytest


def _payload(
    success=True,
    name="  Half-Life™ 2  ",
    devs=("Valve",),
    pubs=("Valve", "Sierra"),
    genres=("Action", "FPS"),
    price=None,
):
    data = {
        "name": name,
        "type": "game",
        "release_date": {"date": "16 Nov, 2004"},
        "developers": list(devs),
        "publishers": list(pubs),
        "genres": [{"description": g} for g in genres],
    }
    if price is not None:
        data["price_overview"] = price
    return json.dumps({"success": success, "data": data})


class TestAppDetailsFlatten:
    @pytest.fixture()
    def parsed(self, spark):
        from steam_data_pipeline_spark.sources.appdetails import parse_app_details

        rows = [
            ("10", _payload(price={"initial": 1999, "final": 999, "currency": "USD",
                                   "discount_percent": 50, "final_formatted": "$9.99"})),
            ("20", _payload(price=None)),            # no price_overview → default
            ("30", _payload(success=False)),          # failed fetch → dropped
            ("40", json.dumps({"success": True, "data": {"name": ""}})),
        ]
        df = spark.createDataFrame(rows, "app_id string, payload string")
        return {r.app_id: r for r in parse_app_details(df).collect()}

    def test_success_filter_drops_failures(self, parsed):
        assert set(parsed) == {"10", "20", "40"}  # main.py:297

    def test_name_trimmed_not_demojibaked(self, parsed):
        # trim only — the ™ stays in the dimension; normalization is a
        # separate derived join key (main.py:301 vs 318-320)
        assert parsed["10"].name == "Half-Life™ 2"

    def test_flatten_joins(self, parsed):
        r = parsed["10"]
        assert r.release_date == "16 Nov, 2004"     # raw string (main.py:303)
        assert r.developer == "Valve"
        assert r.publisher == "Valve, Sierra"
        assert r.genres == "Action, FPS"
        assert r.genres_arr == ["Action", "FPS"]

    def test_price_struct_carried_and_defaulted(self, parsed):
        assert parsed["10"].price_overview.initial == 1999
        d = parsed["20"].price_overview
        assert d.final_formatted == "N/A" and d.discount_percent == 0  # main.py:309-312

    def test_money_scaling(self, spark):
        from steam_data_pipeline_spark.sources.appdetails import (
            parse_app_details,
            timeseries_price_columns,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("10", _payload(price={"initial": 1999, "currency": "USD",
                                    "discount_percent": 50, "final_formatted": "$9.99"}))],
            "app_id string, payload string",
        )
        row = (
            parse_app_details(df)
            .select(*timeseries_price_columns(F.col("price_overview")))
            .collect()[0]
        )
        assert row.price_numeric == Decimal("19.99")  # 1999/100 exact (main.py:362)
        assert row.price_currency == "USD"
        assert row.discount_percent == 50


class TestScheduler:
    def test_skip_run_gate(self):
        from steam_data_pipeline_spark.streaming.scheduler import should_skip_first_run

        assert should_skip_first_run("deploy [skip-run] tweak")
        assert not should_skip_first_run("normal commit")
        assert not should_skip_first_run(None)

    def test_next_run_daily_with_bounded_jitter(self):
        from steam_data_pipeline_spark.streaming.scheduler import next_run_at

        now = datetime(2024, 1, 1, 18, 0, tzinfo=timezone.utc)  # past 17:00
        nxt = next_run_at(now, run_hour_utc=17, jitter_seed=7)
        assert nxt.day == 2 and nxt.hour in (17, 18)  # +1 day, jitter < 120 min
        assert nxt == next_run_at(now, run_hour_utc=17, jitter_seed=7)  # seeded

    def test_graceful_stop_interrupts_wait(self):
        from steam_data_pipeline_spark.streaming.scheduler import ScheduledRunner

        runner = ScheduledRunner(run_fn=lambda: None, jitter_seed=1)
        t0 = time.time()
        threading.Timer(0.2, runner.stop).start()
        runs = runner.run_loop(max_runs=5)
        assert time.time() - t0 < 5  # did not sleep until tomorrow
        assert runs == 1  # ran once, then stopped during the wait

    def test_max_runs_bound(self):
        from steam_data_pipeline_spark.streaming.scheduler import ScheduledRunner

        calls = []
        runner = ScheduledRunner(run_fn=lambda: calls.append(1))
        assert runner.run_loop(max_runs=1) == 1 and len(calls) == 1


class TestApi:
    def test_health_and_sample_roundtrip(self, spark, sf_dir, tmp_path):
        from steam_data_pipeline_spark.api import health, read_games_sample, trigger_ingest
        from steam_data_pipeline_spark.operators.state import FileRunJournal
        from steam_data_pipeline_spark.operators.upsert import ParquetTableStore

        store = ParquetTableStore(spark, str(tmp_path / "t"))
        assert health(store)["tables"]["games_metadata"] is None
        assert read_games_sample(store) == []
        journal = FileRunJournal(str(tmp_path / "j.json"))
        stats = trigger_ingest(spark, sf_dir, store, journal, background=False)
        assert stats["dim_rows"] > 0
        sample = read_games_sample(store, n=5)
        assert len(sample) == 5
        assert [s["app_id"] for s in sample] == sorted(s["app_id"] for s in sample)
        h = health(store)
        assert h["tables"]["games_metadata"] == stats["dim_rows"]
