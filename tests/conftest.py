from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from steam_data_pipeline_spark.session import get_spark

    spark = get_spark("steam-data-pipeline-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(autouse=True)
def _release_registered_spines():
    """Operators that cache a bounded spine register it with
    operators.caching; unpersist after every test so the session-scoped
    SparkSession doesn't accumulate cached blocks across the suite
    (round-10 ADVICE). No-op (empty list pop) for the vast majority of
    tests that never touch a spine-caching operator."""
    yield
    from steam_data_pipeline_spark.operators.caching import release_spines

    release_spines()
