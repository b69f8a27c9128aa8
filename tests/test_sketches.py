"""Unit tests for the frequency-sketch layer (llm/sketches.py):
space-saving heavy hitters under counter pressure, count-min bounds and
mergeability, bloom no-false-negatives / FPR / probe-path agreement."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from steam_data_pipeline_spark.llm import sketches as SK


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """Zipf-ish corpus whose vocabulary (200 tokens) exceeds the
    space-saving capacity used in the tests (64), so eviction actually
    runs — heavy tokens must still survive the candidate pass."""
    rng = random.Random(42)
    vocab = [f"tok{i:03d}" for i in range(200)]
    rows = []
    for doc_id in range(300):
        # zipf-ish: token i drawn with weight ~ 1/(i+1)
        words = rng.choices(vocab, weights=[1.0 / (i + 1) for i in range(200)], k=40)
        rows.append((doc_id, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(8)


class TestHeavyHitters:
    def test_sketched_equals_exact_under_pressure(self, spark, skewed_docs):
        exact = SK.heavy_hitters_exact(skewed_docs, k=10).collect()
        sk = SK.heavy_hitters_sketched(skewed_docs, k=10, capacity=64).collect()
        assert [(r["token"], r["cnt"]) for r in sk] == [
            (r["token"], r["cnt"]) for r in exact
        ]

    def test_candidate_guarantee(self, spark, skewed_docs):
        """Every token with count >= N/capacity must appear among the
        space-saving candidates (Misra-Gries union guarantee)."""
        capacity = 64
        cands = {
            r["token"]
            for r in SK.heavy_hitter_candidates(skewed_docs, capacity).collect()
        }
        counts = SK.tokens(skewed_docs).groupBy("token").count().collect()
        n_total = sum(r["count"] for r in counts)
        for r in counts:
            if r["count"] >= n_total / capacity:
                assert r["token"] in cands, r["token"]

    def test_candidate_set_bounded(self, spark, skewed_docs):
        cands = SK.heavy_hitter_candidates(skewed_docs, 64)
        n_parts = SK.tokens(skewed_docs).rdd.getNumPartitions()
        assert cands.count() <= 64 * n_parts


class TestCountMin:
    WIDTH, DEPTH = 256, 4  # narrow width so collisions actually happen

    def test_never_underestimates(self, spark, skewed_docs):
        toks = SK.tokens(skewed_docs)
        exact = toks.groupBy("token").agg(
            F.count(F.lit(1)).cast("long").alias("exact_cnt")
        )
        sketch = SK.countmin_build(toks, "token", self.WIDTH, self.DEPTH)
        est = SK.countmin_estimate(
            sketch, exact, "token", self.WIDTH, self.DEPTH
        ).withColumnRenamed("item", "token")
        bad = exact.join(est, "token").filter(F.col("est") < F.col("exact_cnt"))
        assert bad.count() == 0

    def test_absent_item_small_estimate(self, spark, skewed_docs):
        toks = SK.tokens(skewed_docs)
        n_total = toks.count()
        sketch = SK.countmin_build(toks, "token", self.WIDTH, self.DEPTH)
        probes = spark.createDataFrame(
            [(f"absent{i}",) for i in range(20)], "token string"
        )
        est = SK.countmin_estimate(sketch, probes, "token", self.WIDTH, self.DEPTH)
        # true count 0 → estimate bounded by the ~2N/width collision mass
        assert est.filter(F.col("est") > 4.0 * n_total / self.WIDTH).count() == 0

    def test_merge_equals_whole(self, spark, skewed_docs):
        """CMS(a ∪ b) == merge(CMS(a), CMS(b)) — the mergeability that
        lets per-shard sketches roll up without touching raw data."""
        a = skewed_docs.filter(F.col("doc_id") % 2 == 0)
        b = skewed_docs.filter(F.col("doc_id") % 2 == 1)
        whole = SK.countmin_build(
            SK.tokens(skewed_docs), "token", self.WIDTH, self.DEPTH
        )
        merged = SK.countmin_merge(
            SK.countmin_build(SK.tokens(a), "token", self.WIDTH, self.DEPTH),
            SK.countmin_build(SK.tokens(b), "token", self.WIDTH, self.DEPTH),
        )
        assert sorted(map(tuple, whole.collect())) == sorted(
            map(tuple, merged.collect())
        )


class TestBloom:
    N_BITS, N_HASHES = 1 << 12, 5

    @pytest.fixture(scope="class")
    def inserted(self, spark):
        return spark.createDataFrame(
            [(f"member{i:04d}",) for i in range(300)], "item string"
        )

    @pytest.fixture(scope="class")
    def dense(self, spark, inserted):
        return SK.bloom_dense(
            SK.bloom_build(inserted, "item", self.N_BITS, self.N_HASHES), self.N_BITS
        )

    def test_no_false_negatives(self, spark, inserted, dense):
        missed = inserted.filter(
            ~SK.bloom_contains(dense, F.col("item"), self.N_BITS, self.N_HASHES)
        )
        assert missed.count() == 0

    def test_fpr_below_bound(self, spark, dense):
        import math

        outside = spark.createDataFrame(
            [(f"outsider{i:05d}",) for i in range(5000)], "item string"
        )
        fp = outside.filter(
            SK.bloom_contains(dense, F.col("item"), self.N_BITS, self.N_HASHES)
        ).count()
        k, n, m = self.N_HASHES, 300, self.N_BITS
        theoretical = (1 - math.exp(-k * n / m)) ** k
        assert fp / 5000 <= 3 * theoretical + 0.01

    def test_probe_paths_agree(self, spark, inserted, dense):
        """Join-based bloom_probe and map-side bloom_contains are the
        same predicate."""
        bloom = SK.bloom_build(inserted, "item", self.N_BITS, self.N_HASHES)
        probes = spark.createDataFrame(
            [(f"member{i:04d}",) for i in range(0, 600, 7)]
            + [(f"outsider{i}",) for i in range(50)],
            "item string",
        )
        via_join = {
            r["item"]: r["might_contain"]
            for r in SK.bloom_probe(
                bloom, probes, "item", self.N_BITS, self.N_HASHES
            ).collect()
        }
        via_expr = {
            r["item"]: r["mc"]
            for r in probes.select(
                "item",
                SK.bloom_contains(
                    dense, F.col("item"), self.N_BITS, self.N_HASHES
                ).alias("mc"),
            ).collect()
        }
        assert via_join == via_expr

    def test_dense_word_count_fixed(self, spark, inserted, dense):
        assert len(dense) == self.N_BITS // 64


class TestDecontamBloom:
    def test_equals_exact_contamination(self, spark, sf_dir):
        from steam_data_pipeline_spark.llm.curation import (
            contamination,
            decontam_bloom,
        )
        from steam_data_pipeline_spark.sources.tables import read_table

        docs = read_table(spark, sf_dir, "documents")
        bench = docs.filter(F.col("doc_id") < 50)
        exact = {
            (r["doc_id"], r["n_grams"], r["n_matched"])
            for r in contamination(docs, bench, n=5).collect()
        }
        gated = {
            (r["doc_id"], r["n_grams"], r["n_matched"])
            for r in decontam_bloom(docs, bench, n=5).collect()
        }
        assert exact == gated


class TestBloomProbeCardinality:
    def test_duplicate_probe_rows_preserved(self, spark):
        """bloom_probe appends a column — two identical probe rows must
        come back as TWO rows (the old payload-column groupBy collapsed
        them, corrupting downstream counts; round-9 module review)."""
        import steam_data_pipeline_spark.llm.sketches as SK

        inserted = spark.createDataFrame([("x",), ("y",)], "item string")
        bloom = SK.bloom_build(inserted, "item", 1 << 12, 3)
        probes = spark.createDataFrame(
            [("x",), ("x",), ("zz",)], "item string"
        )
        out = SK.bloom_probe(bloom, probes, "item", 1 << 12, 3).collect()
        assert len(out) == 3
        hits = sorted((r["item"], r["might_contain"]) for r in out)
        assert hits == [("x", True), ("x", True), ("zz", hits[2][1])]
