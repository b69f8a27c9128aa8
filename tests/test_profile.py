"""Data-quality layer (operators/profile.py): profiler semantics,
expectation semantics (NULL-predicate, NULL-key uniqueness, NULL-FK
referential), PSI binning edge cases, and the single-scan plan
contract for the melt profiler."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from steam_data_pipeline_spark.operators.profile import (
    ColSpec,
    Expect,
    check,
    profile,
    psi_drift,
)


def _rows(df):
    return {r["col"]: r.asDict() for r in df.collect()}


class TestProfile:
    def test_null_and_distinct_accounting(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (4, "b", 2.5)],
            "id long, s string, x double",
        )
        out = _rows(
            profile(
                df,
                [ColSpec("id", "num"), ColSpec("s", "str"), ColSpec("x", "num")],
            )
        )
        assert out["id"]["n_rows"] == 4
        assert out["id"]["n_nonnull"] == 4
        assert out["id"]["n_distinct"] == 4
        assert out["id"]["min_num"] == 1.0 and out["id"]["max_num"] == 4.0
        assert out["s"]["n_nonnull"] == 3
        assert out["s"]["n_distinct"] == 2  # a, b — NULL not a value
        assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
        assert out["x"]["n_nonnull"] == 3
        assert out["x"]["n_distinct"] == 2  # 1.5, 2.5 deduped
        assert out["x"]["min_num"] == 1.5 and out["x"]["max_num"] == 2.5

    def test_all_null_column(self, spark):
        df = spark.createDataFrame([(1, None), (2, None)], "id long, s string")
        out = _rows(profile(df, [ColSpec("s", "str")]))
        assert out["s"]["n_rows"] == 2
        assert out["s"]["n_nonnull"] == 0
        assert out["s"]["n_distinct"] == 0
        assert out["s"]["min_str"] is None

    def test_single_scan_two_shuffles(self, spark):
        """The whole profile — any number of columns — is one scan
        feeding two hash aggregates; no Expand-based distinct plan."""
        df = spark.range(100).select(
            F.col("id"),
            (F.col("id") % 7).alias("a"),
            (F.col("id") % 3).cast("string").alias("b"),
        )
        plan = (
            profile(
                df,
                [ColSpec("id", "num"), ColSpec("a", "num"), ColSpec("b", "str")],
            )
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        )
        assert plan.count("Exchange hashpartitioning") == 2, plan
        assert "Expand" not in plan, plan


class TestCheck:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, 10, 5.0),
                (1, 20, -1.0),  # dup key, negative value
                (2, None, None),  # null fk, null value (predicate → violation)
                (None, 30, 2.0),  # null key
                (None, 40, 3.0),  # second null key → dup under GROUP BY
            ],
            "k long, fk long, v double",
        )

    def test_semantics(self, spark):
        dim = spark.createDataFrame([(10,), (20,), (30,)], "d long")
        out = {
            r["constraint"]: r["violations"]
            for r in check(
                self._df(spark),
                [
                    Expect("fk_complete", "complete", col="fk"),
                    Expect("v_pos", "predicate", predicate=F.col("v") > 0),
                    Expect("k_unique", "unique", col="k"),
                    Expect("fk_ref", "ref", col="fk", ref_df=dim, ref_col="d"),
                ],
            ).collect()
        }
        assert out["fk_complete"] == 1
        # NULL predicate counts as a violation alongside the false one
        assert out["v_pos"] == 2
        # k=1 twice (+1) and k=NULL twice (+1): NULL keys form one group
        assert out["k_unique"] == 2
        # fk=40 is an orphan; fk=NULL never matches → orphan too
        assert out["fk_ref"] == 2

    def test_passed_flag(self, spark):
        out = {
            r["constraint"]: r["passed"]
            for r in check(
                self._df(spark),
                [
                    Expect("k_complete", "complete", col="k"),
                    Expect("v_big", "predicate", predicate=F.col("v") > -10),
                ],
            ).collect()
        }
        assert out["k_complete"] is False
        assert out["v_big"] is False  # NULL v row violates


class TestPsiDrift:
    def test_identical_populations_zero(self, spark):
        df = spark.range(1000).select((F.col("id") % 97).cast("double").alias("x"))
        rows = psi_drift(df, df, "x", n_bins=5).collect()
        assert len(rows) == 5
        assert all(r["contrib"] == 0.0 for r in rows)
        assert sum(r["cnt_ref"] for r in rows) == 1000

    def test_max_value_lands_in_last_bin(self, spark):
        ref = spark.createDataFrame([(0.0,), (10.0,)], "x double")
        cur = spark.createDataFrame([(10.0,), (10.0,)], "x double")
        rows = {r["bin"]: r for r in psi_drift(ref, cur, "x", n_bins=4).collect()}
        assert rows[3]["cnt_ref"] == 1 and rows[3]["cnt_cur"] == 2
        assert rows[0]["cnt_ref"] == 1 and rows[0]["cnt_cur"] == 0

    def test_constant_column_no_divide_by_zero(self, spark):
        """vmax == vmin (constant column) must route every row to bin 0,
        not divide by zero under ANSI mode (round-7 advice fix)."""
        df = spark.createDataFrame([(5.0,)] * 6, "x double")
        rows = {r["bin"]: r for r in psi_drift(df, df, "x", n_bins=4).collect()}
        assert rows[0]["cnt_ref"] == 6 and rows[0]["cnt_cur"] == 6
        assert all(rows[b]["cnt_ref"] == 0 for b in (1, 2, 3))
        assert all(r["contrib"] == 0.0 for r in rows.values())

    def test_psi_total_matches_reference_formula(self, spark):
        ref = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
        cur = spark.createDataFrame([(float(i % 5),) for i in range(80)], "x double")
        rows = psi_drift(ref, cur, "x", n_bins=5).collect()
        # recompute driver-side from the exact counts the operator emits
        tr = sum(r["cnt_ref"] for r in rows) + 5
        tc = sum(r["cnt_cur"] for r in rows) + 5
        for r in rows:
            p = (r["cnt_ref"] + 1) / tr
            q = (r["cnt_cur"] + 1) / tc
            assert r["contrib"] == pytest.approx(
                round((p - q) * math.log(p / q), 9), abs=1e-12
            )

    def test_nulls_excluded(self, spark):
        ref = spark.createDataFrame([(1.0,), (None,), (2.0,)], "x double")
        cur = spark.createDataFrame([(1.0,), (2.0,)], "x double")
        rows = psi_drift(ref, cur, "x", n_bins=2).collect()
        assert sum(r["cnt_ref"] for r in rows) == 2


class TestMadOutliers:
    def test_flags_planted_spike(self, spark):
        from steam_data_pipeline_spark.operators.profile import mad_outliers

        rows = []
        for d in range(1, 21):
            n = 100 if d != 10 else 900  # day 10 is a 9x spike
            rows += [(f"2024-01-{d:02d} 00:00:00",)] * n
        df = spark.createDataFrame(rows, "ts string").select(
            F.to_timestamp("ts").alias("ts")
        )
        out = {r["day"].day: r for r in mad_outliers(df, "ts").collect()}
        assert out[10]["is_outlier"] is True
        assert sum(r["is_outlier"] for r in out.values()) == 1
        assert out[10]["med"] == 100.0 and out[10]["mad"] == 0.0

    def test_uniform_series_no_flags(self, spark):
        from steam_data_pipeline_spark.operators.profile import mad_outliers

        rows = [(f"2024-02-{d:02d} 12:00:00",) for d in range(1, 11)] * 7
        df = spark.createDataFrame(rows, "ts string").select(
            F.to_timestamp("ts").alias("ts")
        )
        assert (
            mad_outliers(df, "ts").filter(F.col("is_outlier")).count() == 0
        )


class TestSnapshotDiff:
    def test_all_statuses(self, spark):
        from steam_data_pipeline_spark.operators.profile import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")],
            "k long, c1 string, c2 string",
        )
        new = spark.createDataFrame(
            [(1, "a", "x"), (2, "B", "y"), (4, "d", "w")],
            "k long, c1 string, c2 string",
        )
        out = {
            r["k"]: r["status"]
            for r in snapshot_diff(old, new, "k", ["c1", "c2"]).collect()
        }
        assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}

    def test_separator_prevents_column_bleed(self, spark):
        from steam_data_pipeline_spark.operators.profile import snapshot_diff

        old = spark.createDataFrame([(1, "ab", "c")], "k long, c1 string, c2 string")
        new = spark.createDataFrame([(1, "a", "bc")], "k long, c1 string, c2 string")
        [r] = snapshot_diff(old, new, "k", ["c1", "c2"]).collect()
        assert r["status"] == "changed"


class TestPsiDriftMulti:
    def test_equals_per_column_psi(self, spark):
        from steam_data_pipeline_spark.operators.profile import (
            psi_drift,
            psi_drift_multi,
        )

        ref = spark.createDataFrame(
            [(float(i % 10), float(i % 3)) for i in range(90)],
            "a double, b double",
        )
        cur = spark.createDataFrame(
            [(float(i % 5), float(i % 7)) for i in range(70)],
            "a double, b double",
        )
        multi = {
            (r["col"], r["bin"]): (r["cnt_ref"], r["cnt_cur"], r["contrib"])
            for r in psi_drift_multi(ref, cur, ["a", "b"], n_bins=4).collect()
        }
        for c in ("a", "b"):
            single = {
                (c, r["bin"]): (r["cnt_ref"], r["cnt_cur"], r["contrib"])
                for r in psi_drift(ref, cur, c, n_bins=4).collect()
            }
            for k, v in single.items():
                assert multi[k] == v, (k, v, multi[k])
        assert len(multi) == 8
