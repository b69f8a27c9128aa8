"""sorted_grouped_map == applyInPandas equivalence, including the
cross-batch group-stitching path (forced tiny Arrow batches)."""

from __future__ import annotations

import sys

import pandas as pd
import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F

from steam_data_pipeline_spark.operators.grouped import sorted_grouped_map

# test-module functions cross to Python workers inside the pandas UDFs;
# workers cannot import tests.* so ship them by value
cloudpickle.register_pickle_by_value(sys.modules[__name__])

SCHEMA = "k bigint, n bigint, first_v bigint, last_v bigint, s bigint"


def _summary(pdf: pd.DataFrame) -> pd.DataFrame:
    # order-sensitive on purpose: first/last expose any ordering break,
    # the sum any lost/duplicated row
    return pd.DataFrame(
        {
            "k": pdf["k"].iloc[:1].values,
            "n": [len(pdf)],
            "first_v": [int(pdf["v"].iloc[0])],
            "last_v": [int(pdf["v"].iloc[-1])],
            "s": [int(pdf["v"].sum())],
        }
    )


def _mkdf(spark, n_keys: int, rows_per_key: int):
    rows = [
        (k, (k * 7919 + i * 104729) % 100003, i)
        for k in range(n_keys)
        for i in range(rows_per_key + (k % 3))
    ]
    return spark.createDataFrame(rows, "k bigint, v bigint, i bigint")


@pytest.mark.parametrize("batch_size", ["3", "10000"])
def test_equivalence_with_apply_in_pandas(spark, batch_size):
    """Tiny Arrow batches force every multi-row group to straddle batch
    boundaries — the stitching path; the default size exercises the
    whole-partition fast path. Both must equal applyInPandas."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch_size)
    try:
        df = _mkdf(spark, n_keys=23, rows_per_key=5)
        got = sorted(
            map(
                tuple,
                sorted_grouped_map(
                    df, ["k"], ["i"], _summary, SCHEMA
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                df.groupBy("k")
                .applyInPandas(
                    lambda p: _summary(p.sort_values("i").reset_index(drop=True)),
                    SCHEMA,
                )
                .collect(),
            )
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


@pytest.mark.parametrize("batch_size", ["3", "10000"])
def test_null_keys_group_together(spark, batch_size):
    """applyInPandas puts ALL null-key rows in one group; the naive
    ne(shift) split fragments them (NaN != NaN is True in pandas).
    Forced 3-row batches make the null run straddle a batch boundary
    so the stitching path is exercised with null keys too."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch_size)
    try:
        rows = [(None, 100 + i, i) for i in range(7)] + [
            (k, k * 10 + i, i) for k in (1, 2) for i in range(4)
        ]
        df = spark.createDataFrame(rows, "k bigint, v bigint, i bigint")
        got = sorted(
            map(
                tuple,
                sorted_grouped_map(df, ["k"], ["i"], _summary, SCHEMA).collect(),
            ),
            key=repr,
        )
        want = sorted(
            map(
                tuple,
                df.groupBy("k")
                .applyInPandas(
                    lambda p: _summary(p.sort_values("i").reset_index(drop=True)),
                    SCHEMA,
                )
                .collect(),
            ),
            key=repr,
        )
        assert got == want
        assert any(r[0] is None and r[1] == 7 for r in got), got
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_single_group_and_empty(spark):
    one = spark.createDataFrame([(1, 5, 0), (1, 9, 1)], "k bigint, v bigint, i bigint")
    got = sorted_grouped_map(one, ["k"], ["i"], _summary, SCHEMA).collect()
    assert len(got) == 1 and got[0].n == 2 and got[0].first_v == 5 and got[0].last_v == 9
    empty = one.filter(F.col("k") < 0)
    assert sorted_grouped_map(empty, ["k"], ["i"], _summary, SCHEMA).count() == 0


def test_plan_is_single_mapinpandas(spark):
    df = _mkdf(spark, 5, 3)
    plan = (
        sorted_grouped_map(df, ["k"], ["i"], _summary, SCHEMA)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    )
    assert plan.count("MapInPandas") == 1, plan
    assert "FlatMapGroupsInPandas" not in plan, plan
