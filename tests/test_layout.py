"""Z-order layout tests: Morton-code correctness vs a Python
reference, grid clamping, and the footer-only file-skipping audit that
justifies the layout (z-order must beat a single-column sort on 2-D
and cross-dimension probes)."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from steam_data_pipeline_spark.operators import layout as L


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


class TestMorton:
    def test_matches_reference(self, spark):
        import random

        rng = random.Random(7)
        pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {
            (r.x, r.y): r.z
            for r in df.select(
                "x", "y", L.zorder_value(F.col("x"), F.col("y"), 16).alias("z")
            ).collect()
        }
        for (x, y), z in got.items():
            assert z == _morton_ref(x, y, 16)

    def test_grid_scale_clamps(self, spark):
        df = spark.createDataFrame([(-5,), (0,), (50,), (100,), (200,)], "v long")
        out = [
            r.g
            for r in df.select(
                L.grid_scale(F.col("v"), F.lit(0), F.lit(100), bits=4).alias("g")
            ).collect()
        ]
        assert out[0] == 0 and out[-1] == 15  # clamped to grid edges
        assert all(0 <= g <= 15 for g in out)


class TestFileSkipping:
    @pytest.fixture(scope="class")
    def layouts(self, spark, sf_dir):
        """Write the same orders table twice: z-ordered on
        (o_custkey, o_day) vs sorted by date only — both 16 files."""
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
            "o_day",
            F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))),
        )
        zdir = tempfile.mkdtemp(prefix="zorder_")
        ldir = tempfile.mkdtemp(prefix="linear_")
        L.write_zordered(orders, zdir, "o_custkey", "o_day", n_files=16)
        (
            orders.repartitionByRange(16, "o_day")
            .sortWithinPartitions("o_day")
            .write.mode("overwrite")
            .parquet(ldir)
        )
        return zdir, ldir

    def test_2d_box_prunes_both_layouts_row_identical(self, spark, layouts):
        zdir, ldir = layouts
        pred = (
            (F.col("o_custkey").between(100, 200))
            & (F.col("o_day").between(0, 180))
        )
        a = sorted(r.o_orderkey for r in spark.read.parquet(zdir).filter(pred).collect())
        b = sorted(r.o_orderkey for r in spark.read.parquet(ldir).filter(pred).collect())
        assert a == b  # layout may never change answers

    def test_cross_dimension_skipping(self, layouts):
        """The probe that motivates z-order: a predicate on the
        dimension the linear layout did NOT sort by. Date-sorted files
        all span the full custkey range (no skipping); z-ordered files
        carry tight custkey ranges."""
        zdir, ldir = layouts
        probe = {"o_custkey": (100, 200)}
        z = L.file_skipping_stats(zdir, probe)
        lin = L.file_skipping_stats(ldir, probe)
        assert lin["n_touched"] == lin["n_files"]  # linear: no skipping
        # measured: 9/16 at sf0.001, 6/16 at sf0.01 (finer grid, less
        # per-file noise) — z-order always skips where linear can't
        assert z["n_touched"] <= 10

    def test_2d_box_skipping_not_worse_than_linear(self, layouts):
        zdir, ldir = layouts
        probe = {"o_custkey": (100, 200), "o_day": (0, 180)}
        z = L.file_skipping_stats(zdir, probe)
        lin = L.file_skipping_stats(ldir, probe)
        assert z["n_touched"] <= lin["n_touched"]

    def test_sorted_dimension_tradeoff_bounded(self, layouts):
        """The price of interleaving: on the dimension linear sorted
        by, z-order touches MORE files than the perfect sort — but the
        give-back stays bounded (measured 4-5/16 vs 2/16), which is
        the documented z-order contract: partial locality in every
        dimension instead of perfect locality in one."""
        zdir, _ = layouts
        z = L.file_skipping_stats(zdir, {"o_day": (0, 180)})
        assert z["n_touched"] <= z["n_files"] // 2
