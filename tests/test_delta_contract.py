"""merge_upsert ⇔ Delta Lake ``MERGE INTO`` equivalence contract.

``operators/upsert.py`` claims its logical MERGE is "exactly
Delta/Iceberg MERGE INTO" on a real deployment. This file pins that
claim executably: when ``delta-spark`` is importable the test builds a
Delta table, runs a genuine ``DeltaTable.merge`` and asserts row-level
equality with :func:`merge_upsert` on the same inputs.

In this build environment ``delta-spark`` is NOT installed (and the
environment forbids installing it), so the test documents the contract
and skips — the semantics themselves are still covered by the
DuckDB-oracle checks of ``sink_upsert_metadata`` /
``stream_microbatch_upsert`` and by ``tests/test_upsert_state.py``
(last-writer-wins, max-version-wins, idempotence, out-of-order
micro-batches), which are exactly the properties a Delta MERGE with
``whenMatchedUpdateAll/whenNotMatchedInsertAll`` guarantees.
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip(
    "delta",
    reason=(
        "delta-spark not installed in this environment (no pip install "
        "allowed); the MERGE contract is documented here and the "
        "equivalent semantics are oracle-checked in "
        "test_upsert_state.py / sink_upsert_metadata"
    ),
)


@pytest.fixture(scope="module")
def delta_spark(tmp_path_factory):
    """A dedicated session with the Delta catalog wired in —
    the shared fixture session can't be reconfigured post-start."""
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-contract")
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def test_merge_upsert_matches_delta_merge(delta_spark, tmp_path):
    from delta.tables import DeltaTable

    from steam_data_pipeline_spark.operators.upsert import merge_upsert

    spark = delta_spark
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    new = spark.createDataFrame(
        [(2, "B", 21), (4, "d", 40)], "k long, s string, v long"
    )
    path = str(tmp_path / "tbl")
    old.write.format("delta").save(path)
    tbl = DeltaTable.forPath(spark, path)
    (
        tbl.alias("t")
        .merge(new.alias("s"), "t.k = s.k")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    got = sorted(map(tuple, spark.read.format("delta").load(path).collect()))
    want = sorted(map(tuple, merge_upsert(old, new, "k").collect()))
    assert got == want


def test_versioned_merge_matches_delta_conditional_update(delta_spark, tmp_path):
    """max-version-wins ≡ Delta MERGE with a version-guarded update:
    an out-of-order batch carrying an older version must not regress."""
    from delta.tables import DeltaTable

    from steam_data_pipeline_spark.operators.upsert import merge_upsert

    spark = delta_spark
    old = spark.createDataFrame(
        [(1, "cur", 5), (2, "cur", 7)], "k long, s string, ver long"
    )
    stale_and_fresh = spark.createDataFrame(
        [(1, "stale", 3), (2, "fresh", 9), (3, "ins", 1)],
        "k long, s string, ver long",
    )
    path = str(tmp_path / "vtbl")
    old.write.format("delta").save(path)
    tbl = DeltaTable.forPath(spark, path)
    (
        tbl.alias("t")
        .merge(stale_and_fresh.alias("s"), "t.k = s.k")
        .whenMatchedUpdateAll(condition="s.ver >= t.ver")
        .whenNotMatchedInsertAll()
        .execute()
    )
    got = sorted(map(tuple, spark.read.format("delta").load(path).collect()))
    want = sorted(
        map(
            tuple,
            merge_upsert(old, stale_and_fresh, "k", version_cols=["ver"]).collect(),
        )
    )
    assert got == want
