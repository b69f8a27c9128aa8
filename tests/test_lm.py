"""Unit tests for llm/lm.py — bigram LM fluency scoring and DSIR
importance weights (semantic properties the differential oracle can't
express: known-model hand-checks, direction-of-effect, hash
portability)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from steam_data_pipeline_spark.llm import lm as LM


@pytest.fixture(scope="module")
def tiny(spark):
    # vocab {a,b}; doc 2 repeats "a b" (the only pattern the model
    # sees twice), doc 3 is the reversed, rarer pattern
    return spark.createDataFrame(
        [
            (1, "a b a b a", "en", "s0"),
            (2, "a b a b a b", "en", "s0"),
            (3, "b a b a", "fr", "s1"),
        ],
        "doc_id long, text string, lang string, source string",
    )


class TestLmScore:
    def test_hand_computed_model(self, spark, tiny):
        """Check p(b|a) against hand counts: corpus bigrams
        ab×7 (docs: 2+3+2), ba×6 (2+2+2), V=2."""
        got = {
            r["doc_id"]: r
            for r in LM.lm_score(tiny).collect()
        }
        # corpus: doc1 a b a b a -> ab,ba,ab,ba ; doc2 -> ab,ba,ab,ba,ab
        # doc3 b a b a -> ba,ab,ba
        # c(ab)=7? doc1:2 doc2:3 doc3:1 = 6 ; c(ba): doc1:2 doc2:2 doc3:2 = 6
        c_ab, c_ba, v = 6.0, 6.0, 2.0
        c_a, c_b = c_ab, c_ba  # context counts from bigram table
        p_ab = (c_ab + 0.5) / (c_a + 0.5 * v)
        p_ba = (c_ba + 0.5) / (c_b + 0.5 * v)
        lp_ab = round(math.log(p_ab), 9)
        lp_ba = round(math.log(p_ba), 9)
        # doc1: 2*ab + 2*ba over 4
        want1 = round((2 * lp_ab + 2 * lp_ba) / 4, 6)
        assert got[1]["n_bigrams"] == 4
        assert got[1]["avg_logprob"] == pytest.approx(want1, abs=2e-6)
        # doc3: 1*ab + 2*ba over 3
        want3 = round((lp_ab + 2 * lp_ba) / 3, 6)
        assert got[3]["n_bigrams"] == 3
        assert got[3]["avg_logprob"] == pytest.approx(want3, abs=2e-6)

    def test_short_docs_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, None), (4, "two words")],
            "doc_id long, text string",
        )
        ids = {r["doc_id"] for r in LM.lm_score(df).collect()}
        assert ids == {4}

    def test_fluent_scores_above_shuffled(self, spark):
        """A corpus of one repeated pattern: conforming docs must
        outscore a deviant doc (the CCNet gate's direction)."""
        rows = [(i, "the cat sat on the mat") for i in range(10)]
        rows.append((99, "mat the on sat cat the"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["avg_logprob"] for r in LM.lm_score(df).collect()}
        assert got[0] > got[99]


class TestDsirWeights:
    def test_target_docs_weight_higher(self, spark):
        """Docs made of target-only tokens must get a higher weight
        than docs of background-only tokens."""
        rows = [(i, "alpha beta gamma", "en") for i in range(5)]
        rows += [(10 + i, "delta epsilon zeta", "fr") for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = {
            r["doc_id"]: r["dsir_logweight"]
            for r in LM.dsir_weights(df, target=F.col("lang") == "en").collect()
        }
        assert got[0] > got[10]
        # and an en-doc's weight is positive, fr-doc's negative
        assert got[0] > 0 > got[10]

    def test_weight_scales_with_length(self, spark):
        """log-weight is a sum over tokens: doubling a target-word doc
        doubles its weight (exact decimal sums make this precise)."""
        df = spark.createDataFrame(
            [(1, "alpha", "en"), (2, "alpha alpha", "en"), (3, "beta", "fr")],
            "doc_id long, text string, lang string",
        )
        got = {
            r["doc_id"]: r
            for r in LM.dsir_weights(df, target=F.col("lang") == "en").collect()
        }
        assert got[2]["n_tokens"] == 2 * got[1]["n_tokens"]
        assert got[2]["dsir_logweight"] == pytest.approx(
            2 * got[1]["dsir_logweight"], abs=2e-6
        )

    def test_bucket_hash_matches_duckdb(self, spark):
        """The Horner-mod roll is the portability contract — pin
        Spark == DuckDB on a unicode-bearing word list."""
        import duckdb

        words = ["table", "agg", "straße", "中文", "x", "Zz9"]
        sdf = spark.createDataFrame([(w,) for w in words], "word string")
        got_spark = {
            r["word"]: r["b"]
            for r in sdf.select(
                "word", LM.portable_word_bucket("word", 256).alias("b")
            ).collect()
        }
        sql = LM.dsir_oracle_bucket_sql("word", 256)
        con = duckdb.connect()
        got_duck = {
            w: con.execute(f"SELECT {sql} FROM (SELECT ? AS word)", [w]).fetchone()[0]
            for w in words
        }
        assert got_spark == got_duck


class TestPartitioningInvariance:
    """The exact-decimal-sum discipline's observable guarantee: any
    repartitioning yields BIT-identical scores (a float-sum
    implementation would differ in the last ulps and break the
    value-hash oracle nondeterministically)."""

    def test_lm_score_partitioning_invariant(self, spark, tiny):
        a = sorted(map(tuple, LM.lm_score(tiny.repartition(1)).collect()))
        b = sorted(map(tuple, LM.lm_score(tiny.repartition(7)).collect()))
        assert a == b

    def test_dsir_partitioning_invariant(self, spark, tiny):
        import pyspark.sql.functions as F2

        a = sorted(
            map(
                tuple,
                LM.dsir_weights(
                    tiny.repartition(1), target=F2.col("lang") == "en"
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                LM.dsir_weights(
                    tiny.repartition(5), target=F2.col("lang") == "en"
                ).collect(),
            )
        )
        assert a == b
