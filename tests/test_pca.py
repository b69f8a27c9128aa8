"""Unit tests for llm/pca.py — known-covariance hand checks and the
projection contract (properties the invariant oracle can't see)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from steam_data_pipeline_spark.llm import pca as P


@pytest.fixture(scope="module")
def planted(spark):
    """120 vectors in R^4 with variance concentrated on axis 0:
    x0 ~ +/-10, x1 ~ +/-1, x2/x3 = 0 — PCA must find e0 then e1."""
    rows = []
    for i in range(120):
        x0 = 10.0 if i % 2 == 0 else -10.0
        x1 = 1.0 if i % 4 < 2 else -1.0
        rows.append((i, [x0, x1, 0.0, 0.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestMoments:
    def test_exact_trace_matches_numpy(self, spark, planted):
        inv = P.pca_invariants(planted, top_k=2).collect()
        assert len(inv) == 2
        r = inv[0]
        assert r["n_vecs"] == 120 and r["d"] == 4
        # trace of population covariance = 100 + 1 (exact inputs)
        trace = int(r["trace_num"]) / (120 * 120 * P.SCALE**2)
        assert trace == pytest.approx(101.0, rel=1e-9)
        assert r["eigsum_ok"] and r["ordered_ok"]
        assert r["orthonormal_ok"] and r["bounds_ok"]

    def test_partitioning_invariance(self, spark, planted):
        """The decimal reduce makes the moments EXACT — repartitioning
        must not change a single output value."""
        a = P.pca_invariants(planted.repartition(1), top_k=3).collect()
        b = P.pca_invariants(planted.repartition(13), top_k=3).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_moment_count_row_carries_dimension(self, spark, planted):
        """The count row is (i=-1, j=d): d rides the otherwise-unused
        j slot so the operator needs no separate dimension-probe job
        (r13), and the groupBy merges every partition's count row into
        one because all surviving rows share d by the size filter."""
        rows = P.moment_sums(planted).collect()
        count_rows = [r for r in rows if r["i"] == -1]
        assert len(count_rows) == 1
        assert count_rows[0]["j"] == 4 and int(count_rows[0]["v"]) == 120


class TestProjection:
    def test_projects_onto_planted_axes(self, spark, planted):
        pcs = {
            r["vec_id"]: r["pc"]
            for r in P.pca_project(planted, top_k=2).collect()
        }
        # pc1 must recover the +/-10 axis (sign of the eigenvector is
        # arbitrary but consistent): |pc1| = 10 for every vector
        for i in (0, 1, 2, 3):
            assert abs(abs(pcs[i][0]) - 10.0) < 1e-6
            assert abs(abs(pcs[i][1]) - 1.0) < 1e-6
        # and opposite-parity vectors land on opposite sides
        assert pcs[0][0] == pytest.approx(-pcs[1][0], abs=1e-6)

    def test_projection_preserves_distances(self, spark, planted):
        """Data lives entirely in a 2-D subspace, so the top-2
        projection is an isometry on it."""
        pcs = {
            r["vec_id"]: np.array(r["pc"])
            for r in P.pca_project(planted, top_k=2).collect()
        }
        raw = {
            r["vec_id"]: np.array(r["embedding"], dtype=float)
            for r in planted.collect()
        }
        for a, b in [(0, 1), (0, 2), (1, 3)]:
            want = float(np.linalg.norm(raw[a] - raw[b]))
            got = float(np.linalg.norm(pcs[a] - pcs[b]))
            assert got == pytest.approx(want, rel=1e-6)


class TestBadInputs:
    def test_project_drops_rows_excluded_from_model(self, spark):
        """pca_project must apply the same NULL/ragged drop policy as
        quantized(): a row excluded from the moments must not come back
        as a null-padded pc array (round-7 advice fix)."""
        clean = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(8)],
            "vec_id long, embedding array<double>",
        )
        dirty = spark.createDataFrame(
            [(100, None), (101, [1.0]), (102, [None, 2.0])],
            "vec_id long, embedding array<double>",
        )
        out = P.pca_project(clean.unionByName(dirty), top_k=2).collect()
        ids = sorted(r["vec_id"] for r in out)
        assert ids == list(range(8))
        assert all(
            all(c is not None for c in r["pc"]) for r in out
        ), "no null components may survive projection"

    def test_null_and_ragged_rows_dropped(self, spark):
        """NULL vectors, ragged lengths and NULL components must be
        dropped under an explicit policy - not crash the matmul or
        silently poison the moments."""
        clean = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(8)],
            "vec_id long, embedding array<double>",
        )
        dirty = spark.createDataFrame(
            [
                (100, None),
                (101, [1.0]),
                (102, [1.0, 2.0, 3.0]),
                (103, [None, 2.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        a = P.pca_invariants(clean, top_k=2).collect()
        b = P.pca_invariants(clean.unionByName(dirty), top_k=2).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_all_null_raises(self, spark):
        df = spark.createDataFrame(
            [(1, None)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="no non-null rows"):
            P.pca_invariants(df)

    def test_probe_row_filtered_out_raises_cleanly(self, spark):
        """The dimension probe pins d from the FIRST non-null row; if
        that row is itself dropped (NULL component) and nothing else
        matches d, the module must surface its messy-embeddings
        ValueError, not a TypeError on None (round-9 module review)."""
        df = spark.createDataFrame(
            [(1, [None, 1.0, 2.0]), (2, [1.0, 2.0])],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="no usable rows"):
            P.pca_invariants(df)


def test_quantization_lower_edge_drops_all_zero_vectors(spark):
    """r13 combined-axis finding (QUANT_EPS): a float32-denormal
    x1e-40 copy quantizes to the ALL-ZERO vector — no direction
    survives, its cluster assignment is arbitrary while its
    original-space cosine is ~1 to the scaled twin, which broke
    SemDeDup's identical=>same-cluster completeness. Vectors whose
    max |component| is below 5e-7 are out of the quantization
    domain on both legs."""
    from pyspark.sql import functions as F

    from steam_data_pipeline_spark.llm.pca import quantizable_components

    df = spark.createDataFrame(
        [
            (1, [1.0e-40, 3.0e-41]),   # all-zero quantization: out
            (2, [0.2, 0.1]),           # normal: in
            (3, [4.9e-7, 1.0e-9]),     # just below the edge: out
            # NB 5.0e-7 itself is NOT float32-representable — it
            # stores as ~4.9999997e-7, rounds to zero, and is
            # correctly dropped; 6e-7 rounds to 1 and stays
            (4, [6.0e-7, 0.0]),        # above the edge: in
        ],
        "vec_id int, embedding array<float>",
    )
    kept = sorted(
        r.vec_id
        for r in df.filter(
            quantizable_components(F.col("embedding"))
        ).collect()
    )
    assert kept == [2, 4]
