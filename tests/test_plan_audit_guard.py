"""Unit contract for tools/plan_audit.py::count_unbounded_bnlj — the
guard that keeps an unbounded BroadcastNestedLoopJoin (an accidental
O(n·m) join at 100 TB) out of the registry while allowing the
sanctioned 1-row scalar-spine crossJoin pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from tools.plan_audit import count_unbounded_bnlj


def test_scalar_spine_crossjoin_is_bounded(spark):
    df = spark.range(100)
    spine = df.agg(F.sum("id").alias("s"))
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(spine))) == 0


def test_limit_bounded_build_side_passes(spark):
    df = spark.range(100)
    assert (
        count_unbounded_bnlj(df.crossJoin(F.broadcast(spark.range(50).limit(3))))
        == 0
    )


def test_unbounded_build_side_is_flagged(spark):
    df = spark.range(100)
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(spark.range(50)))) == 1


def test_no_bnlj_counts_zero(spark):
    a = spark.range(100).withColumnRenamed("id", "k")
    b = spark.range(100).withColumnRenamed("id", "k")
    assert count_unbounded_bnlj(a.join(b, "k")) == 0


def test_grouped_agg_build_side_is_flagged(spark):
    # a grouped aggregate's cardinality tracks its key domain — NOT
    # bounded; only the empty-grouping (1-row) aggregate qualifies
    df = spark.range(100)
    grouped = (
        spark.range(50)
        .withColumn("g", F.col("id") % 10)
        .groupBy("g")
        .agg(F.sum("id").alias("s"))
    )
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(grouped))) == 1
