"""Unit contract for tools/plan_audit.py::count_unbounded_bnlj — the
guard that keeps an unbounded BroadcastNestedLoopJoin (an accidental
O(n·m) join at 100 TB) out of the registry while allowing the
sanctioned 1-row scalar-spine crossJoin pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
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
    # a file scan's cardinality is data-sized — the exact shape the
    # guard exists to catch (broadcast of a table that grows with SF)
    df = spark.range(100)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(docs))) == 1


def test_range_build_side_is_bounded(spark):
    # Range bounds are literals fixed at plan time (the generated-spine
    # pattern) — sanctioned, regardless of data scale
    df = spark.range(100)
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(spark.range(50)))) == 0


def test_no_bnlj_counts_zero(spark):
    a = spark.range(100).withColumnRenamed("id", "k")
    b = spark.range(100).withColumnRenamed("id", "k")
    assert count_unbounded_bnlj(a.join(b, "k")) == 0


def test_grouped_agg_over_scan_is_flagged(spark):
    # a grouped aggregate over a file scan tracks its key domain — a
    # data contract, not a plan-shape proof: flag it (adjudication is
    # BNLJ_CONTRACT_BOUNDED's job, by name)
    df = spark.range(100)
    grouped = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(grouped))) == 1


def test_grouped_agg_over_bounded_input_passes(spark):
    # grouped aggregates emit at most one row per input row, so a
    # plan-time-bounded input propagates the bound through
    df = spark.range(100)
    grouped = (
        spark.range(50)
        .withColumn("g", F.col("id") % 10)
        .groupBy("g")
        .agg(F.sum("id").alias("s"))
    )
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(grouped))) == 0


def test_join_with_one_unbounded_side_is_flagged(spark):
    # the old any-child recursion passed a join of bounded x unbounded;
    # a bound must require ALL inputs bounded
    df = spark.range(100)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")
    build = docs.crossJoin(spark.range(2))
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(build))) == 1


def test_data_dependent_explode_is_flagged(spark):
    # a Generate whose fan-out depends on input values has no
    # plan-time bound, even over a bounded input
    df = spark.range(100)
    build = spark.range(5).select(
        F.explode(F.array_repeat(F.col("id"), F.col("id").cast("int")))
    )
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(build))) == 1


def test_take_ordered_build_side_is_bounded(spark):
    # orderBy(...).limit(k) compiles to TakeOrderedAndProject (no
    # separate Limit node) — it emits <= k rows and must qualify
    df = spark.range(100)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    top1 = docs.orderBy(F.col("n_chars").desc(), F.col("doc_id")).limit(1)
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(top1))) == 0


def test_literal_explode_propagates_bound(spark):
    # explode of a literal array is a plan-time-constant fan-out (the
    # generated-spine pattern): bounded iff its input is
    df = spark.range(100)
    spine = (
        spark.range(20)
        .agg(F.sum("id").alias("s"))
        .select(F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"), "s")
    )
    assert count_unbounded_bnlj(df.crossJoin(F.broadcast(spine))) == 0


def test_cached_bounded_spine_keeps_its_proof(spark):
    """Round-10 ADVICE: an InMemoryTableScan over a plan-time-bounded
    subtree must not lose the bound at the cache wrapper — the walker
    recurses into relation().cachedPlan() (unwrapping the AQE
    ResultQueryStage a materialized cache stores)."""
    b = spark.range(5).agg(F.count("*").alias("n")).cache()
    try:
        b.count()  # materialize -> cachedPlan is an AQE-wrapped stage
        j = spark.range(10).crossJoin(F.broadcast(b))
        assert count_unbounded_bnlj(j) == 0
    finally:
        b.unpersist()


def test_cached_unbounded_build_side_still_flags(spark):
    """The cache wrapper must not LAUNDER an unbounded build side
    either: a cached grouped-agg-over-FILE-scan spine keeps flagging
    (a Range source would be plan-time bounded and prove the bound)."""
    src = spark.read.parquet(f"{SF_SMOKE}/nation.parquet").select(
        (F.col("n_nationkey") % 7).alias("k")
    )
    b = src.groupBy("k").agg(F.count("*").alias("n")).cache()
    try:
        b.count()
        j = spark.range(10).crossJoin(F.broadcast(b))
        assert count_unbounded_bnlj(j) == 1
    finally:
        b.unpersist()


def test_table_scan_counts_sees_through_cache(spark, tmp_path):
    """table_scan_counts counts each distinct cached relation's file
    scans ONCE (materialization cost) and the references under
    __cached__ — so a plan reading a cached parquet-backed frame twice
    reports {table: 1, __cached__: 2}."""
    from tools.plan_audit import table_scan_counts

    p = str(tmp_path / "tbl.parquet")
    spark.range(100).write.parquet(p)
    c = spark.read.parquet(p).cache()
    try:
        c.count()
        two = c.union(c)
        counts = table_scan_counts(two)
        assert counts.get("__cached__") == 2
        assert counts.get("tbl") == 1
    finally:
        c.unpersist()
