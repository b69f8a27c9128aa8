"""Unit tests for the corpus-curation operators (llm/curation.py):
packing recurrence, contamination semantics, quality gates, mix
weights. The registry-level oracle sweep covers value-exactness; these
pin the operator semantics on hand-built corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from steam_data_pipeline_spark.llm.curation import (
    contamination,
    domain_mix_weights,
    pack_sequences,
    pii_scrub,
    quality_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestPackSequences:
    def test_next_fit_recurrence(self, spark):
        # capacity 10; token counts 4,4,4,9,2 → bins [0,0],[1],[2],[3]
        rows = [
            (0, "s", "a b c d"),
            (1, "s", "a b c d"),
            (2, "s", "a b c d"),
            (3, "s", "a b c d e f g h i"),
            (4, "s", "a b"),
        ]
        got = {
            r.doc_id: r.bin_id
            for r in pack_sequences(_docs(spark, rows), capacity=10).collect()
        }
        assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3}

    def test_oversized_doc_gets_own_bin(self, spark):
        rows = [(0, "s", " ".join(["w"] * 20)), (1, "s", "a b")]
        got = {
            r.doc_id: r.bin_id
            for r in pack_sequences(_docs(spark, rows), capacity=10).collect()
        }
        assert got == {0: 0, 1: 1}

    def test_groups_pack_independently(self, spark):
        rows = [(0, "x", "a b c"), (1, "y", "a b c"), (2, "x", "a b c")]
        out = pack_sequences(_docs(spark, rows), capacity=10).collect()
        by_src = {(r.source, r.doc_id): r.bin_id for r in out}
        assert by_src == {("x", 0): 0, ("x", 2): 0, ("y", 1): 0}

    def test_bin_sums_respect_capacity(self, spark):
        rows = [(i, "s", " ".join(["w"] * (3 + i % 5))) for i in range(40)]
        out = pack_sequences(_docs(spark, rows), capacity=16).collect()
        sums: dict[int, int] = {}
        for r in out:
            sums[r.bin_id] = sums.get(r.bin_id, 0) + r.n_tokens
        assert all(s <= 16 for s in sums.values())
        # next-fit leaves no two consecutive bins that could merge
        assert len(sums) >= sum(3 + i % 5 for i in range(40)) / 16


class TestContamination:
    def test_benchmark_doc_fully_contaminated(self, spark):
        rows = [(0, "s", "a b c d e f"), (1, "s", "x y z w v u")]
        docs = _docs(spark, rows)
        bench = docs.filter(F.col("doc_id") == 0)
        got = {r.doc_id: r.contamination for r in contamination(docs, bench, n=5).collect()}
        assert got[0] == 1.0  # benchmark member: all grams match
        assert got[1] == 0.0  # disjoint vocabulary: none

    def test_partial_overlap_fraction(self, spark):
        # doc 1 shares exactly one 5-gram window with the benchmark
        rows = [(0, "s", "a b c d e"), (1, "s", "a b c d e f")]
        docs = _docs(spark, rows)
        bench = docs.filter(F.col("doc_id") == 0)
        got = {r.doc_id: (r.n_grams, r.n_matched) for r in contamination(docs, bench, n=5).collect()}
        assert got[1] == (2, 1)

    def test_short_docs_excluded(self, spark):
        rows = [(0, "s", "a b c d e"), (1, "s", "a b")]
        docs = _docs(spark, rows)
        out = contamination(docs, docs, n=5)
        assert {r.doc_id for r in out.collect()} == {0}

    def test_ngram_arrays_distinct_and_short_doc_empty(self, spark):
        """word_ngram_arrays (the un-exploded primitive decontam_bloom's
        totals leg reads size() from, r13): distinct grams per document,
        empty array below n words — so size(__grams) reproduces the
        explode leg's per-document counts exactly."""
        from steam_data_pipeline_spark.llm.curation import word_ngram_arrays

        rows = [(0, "s", "a b a b a b"), (1, "s", "a b")]
        docs = _docs(spark, rows)
        # r["__grams"], not r.__grams: attribute access would trigger
        # Python's class-private name mangling inside this test class
        got = {r.doc_id: sorted(r["__grams"]) for r in
               word_ngram_arrays(docs, "text", 3).collect()}
        assert got[0] == ["a b a", "b a b"]  # repeats collapsed
        assert got[1] == []


class TestQualitySignals:
    def test_signals_and_gate(self, spark):
        text = "the quick brown fox jumps over the lazy dog again and again"
        df = _docs(spark, [(0, "s", text)])
        r = quality_signals(df, stopwords=["the", "and"]).collect()[0]
        assert r.n_words == 12
        assert r.stop_frac == pytest.approx(3 / 12)
        assert r.distinct_frac == pytest.approx(10 / 12)
        assert r.quality_ok

    def test_repetitive_doc_fails_gate(self, spark):
        df = _docs(spark, [(0, "s", " ".join(["spam"] * 40))])
        r = quality_signals(df).collect()[0]
        assert r.distinct_frac == pytest.approx(1 / 40)
        assert not r.quality_ok


class TestDomainMix:
    def test_weights_normalize_and_order(self, spark):
        rows = [(i, f"s{i % 2}", " ".join(["w"] * (10 if i % 2 else 40))) for i in range(4)]
        out = domain_mix_weights(_docs(spark, rows)).collect()
        w = {r.source: r.mix_weight for r in out}
        assert sum(w.values()) == pytest.approx(1.0)
        # sqrt temperature flattens: big domain still heavier, but less
        # than its raw 80/20 token share
        share = {r.source: r.token_share for r in out}
        assert share["s0"] == pytest.approx(0.8)
        assert w["s0"] < 0.8 and w["s0"] > w["s1"]


class TestPiiScrub:
    def test_digits_masked_and_counted(self, spark):
        df = spark.createDataFrame(
            [("k1", "Customer#000000042"), ("k2", "no digits here")],
            "k string, name string",
        )
        got = {r.k: (r.masked, r.n_redacted) for r in pii_scrub(df, "k", "name").collect()}
        assert got["k1"] == ("Customer##########", 9)
        assert got["k2"] == ("no digits here", 0)


class TestUrlDedup:
    CASES = [
        # (messy, canonical)
        ("https://a.example.com/x?id=1&lang=en",
         "https://a.example.com/x?id=1&lang=en"),
        # host/scheme case + trailing slash + param order
        ("HTTPS://A.EXAMPLE.COM/x/?lang=en&id=1",
         "https://a.example.com/x?id=1&lang=en"),
        # tracking params stripped (utm_*, fbclid, gclid, ref_*)
        ("https://a.example.com/x?utm_source=f&id=1&fbclid=z&lang=en&gclid=q&ref_src=t",
         "https://a.example.com/x?id=1&lang=en"),
        # fragment dropped, default port excluded from HOST
        ("https://a.example.com:443/x?lang=en&id=1#sec",
         "https://a.example.com/x?id=1&lang=en"),
        # http scheme preserved (conservative: http != https)
        ("http://a.example.com/x?id=1", "http://a.example.com/x?id=1"),
        # no query at all -> no '?'
        ("https://a.example.com/x/", "https://a.example.com/x"),
        # ONLY tracking params -> query removed entirely
        ("https://a.example.com/x?utm_source=f", "https://a.example.com/x"),
        # ALL trailing slashes stripped (the idempotent rule — one-at-
        # a-time stripping fails the fixpoint property)
        ("https://a.example.com/x//", "https://a.example.com/x"),
        # malformed-URL policy: no scheme+host -> raw trimmed text is
        # the identity (try_parse_url; ANSI parse_url would THROW here
        # and fail the whole job on the first bad crawl URL)
        ("not a url", "not a url"),
        ("  spaced junk  ", "spaced junk"),
        # scheme but no host (mailto) -> raw fallback
        ("mailto:x@y.com", "mailto:x@y.com"),
        # relative path (no scheme/host) -> raw fallback
        ("/relative/path/", "/relative/path/"),
        # empty string -> empty identity, not NULL
        ("", ""),
    ]

    def test_canonicalize_rules(self, spark):
        from steam_data_pipeline_spark.llm.curation import canonicalize_url

        df = spark.createDataFrame(
            [(i, m) for i, (m, _) in enumerate(self.CASES)], "i long, url string"
        )
        got = {
            r.i: r.c
            for r in df.select("i", canonicalize_url("url").alias("c")).collect()
        }
        for i, (messy, want) in enumerate(self.CASES):
            assert got[i] == want, f"case {i}: {messy!r} -> {got[i]!r}, want {want!r}"

    def test_canonicalize_is_idempotent(self, spark):
        """canonicalize(canonicalize(u)) == canonicalize(u): canonical
        output must be a fixpoint (lowercase scheme/host, no trailing
        slash, no fragment, sorted kept params re-sort to themselves).
        One batched job over 200 seeded component-combination URLs."""
        import random

        from steam_data_pipeline_spark.llm.curation import canonicalize_url

        rng = random.Random(7)
        schemes = ["http", "https", "HTTPS", "HTTP"]
        hosts = ["A.Example.COM", "b.example.com", "c.EXAMPLE.com:443"]
        paths = ["", "/", "/x", "/x/", "/x/y.html", "/x//"]
        params = ["id=1", "lang=en", "utm_source=f", "ref_src=t", "a=b%20c", "z="]
        frags = ["", "#top", "#a/b"]
        urls = []
        for i in range(200):
            q = "&".join(rng.sample(params, rng.randint(0, len(params))))
            urls.append(
                (
                    i,
                    rng.choice(schemes) + "://" + rng.choice(hosts)
                    + rng.choice(paths) + (("?" + q) if q else "")
                    + rng.choice(frags),
                )
            )
        df = spark.createDataFrame(urls, "i long, url string")
        once = canonicalize_url("url")
        bad = (
            df.select("url", once.alias("c1"), canonicalize_url(once).alias("c2"))
            .filter("c1 IS DISTINCT FROM c2")
            .collect()
        )
        assert not bad, f"non-fixpoint canonicals: {bad[:5]}"

    def test_url_dedup_grouping(self, spark):
        from steam_data_pipeline_spark.llm.curation import url_dedup

        df = spark.createDataFrame(
            [
                (1, "https://a.example.com/x?id=1&lang=en"),
                (2, "HTTPS://A.EXAMPLE.COM/x/?lang=en&id=1"),
                (3, "https://a.example.com/x?utm_source=f&id=1&lang=en"),
                (4, "https://b.example.com/y"),
            ],
            "doc_id long, url string",
        )
        rows = {r.canonical_url: (r.n_docs, r.keeper) for r in url_dedup(df).collect()}
        assert rows == {
            "https://a.example.com/x?id=1&lang=en": (3, 1),
            "https://b.example.com/y": (1, 4),
        }

    def test_url_dedup_malformed_mix(self, spark):
        """Realistic crawl mix: well-formed dupes + malformed junk +
        NULL urls in ONE frame. The job must not throw (ANSI parse_url
        would), malformed URLs must keep distinct identities (not one
        NULL group), and NULL urls are excluded entirely."""
        from steam_data_pipeline_spark.llm.curation import url_dedup

        df = spark.createDataFrame(
            [
                (1, "https://a.example.com/x?id=1"),
                (2, "HTTPS://A.EXAMPLE.COM/x/?id=1"),
                (3, "not a url"),
                (4, "also not a url"),
                (5, "mailto:x@y.com"),
                (6, None),
                (7, None),
            ],
            "doc_id long, url string",
        )
        rows = {r.canonical_url: (r.n_docs, r.keeper) for r in url_dedup(df).collect()}
        assert rows == {
            "https://a.example.com/x?id=1": (2, 1),
            "not a url": (1, 3),
            "also not a url": (1, 4),
            "mailto:x@y.com": (1, 5),
        }


class TestRepetitionSignals:
    def test_known_fractions(self, spark):
        from steam_data_pipeline_spark.llm.curation import repetition_signals

        # "ab cd ab cd ab cd" -> top 2-gram "ab cd" x3 (len 5), text len 17
        # no 5-gram repeats (grams: 2 distinct)
        df = spark.createDataFrame(
            [
                (1, "ab cd ab cd ab cd"),
                (2, " ".join(f"w{i:02d}" for i in range(30))),  # all unique
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in repetition_signals(df).collect()}
        r1 = rows[1]
        assert r1.top_2gram == "ab cd" and r1.top_2gram_cnt == 3
        assert r1.top_2gram_frac == 3 * 5 / 17
        assert r1.dup_5gram_frac == 0.0
        assert not r1.keep  # 15/17 > 0.20
        r2 = rows[2]
        assert r2.top_2gram_cnt == 1 and r2.keep

    def test_short_doc_keeps_row(self, spark):
        from steam_data_pipeline_spark.llm.curation import repetition_signals

        df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
        r = repetition_signals(df).collect()[0]
        assert r.top_2gram is None and r.top_2gram_frac == 0.0 and r.keep

    def test_dup5_counts_all_occurrences(self, spark):
        from steam_data_pipeline_spark.llm.curation import repetition_signals

        # the same 5-gram 3 times back-to-back: "a b c d e" repeated
        text = "a b c d e " * 3
        df = spark.createDataFrame([(1, text.strip())], "doc_id long, text string")
        r = repetition_signals(df).collect()[0]
        assert r.dup_5gram_frac > 0.30 and not r.keep


class TestReservoirSample:
    def test_sample_size_and_stability(self, spark, sf_dir):
        from steam_data_pipeline_spark.plans.registry import QUERIES

        q = QUERIES["samp_reservoir_per_key"].spark
        a = {(r.source, r.doc_id, r.rank) for r in q(spark, sf_dir).collect()}
        b = {(r.source, r.doc_id, r.rank) for r in q(spark, sf_dir).collect()}
        assert a == b  # deterministic across runs
        per_key = {}
        for src, _, _ in a:
            per_key[src] = per_key.get(src, 0) + 1
        assert all(v == 5 for v in per_key.values())

    def test_windowgrouplimit_plan(self, spark, sf_dir):
        from steam_data_pipeline_spark.plans.registry import QUERIES

        import contextlib
        import io

        df = QUERIES["samp_reservoir_per_key"].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "WindowGroupLimit" in buf.getvalue()

    def test_seed_redraws(self, spark, sf_dir):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window
        from steam_data_pipeline_spark.sources.tables import read_table

        docs = read_table(spark, sf_dir, "documents")

        def sample(seed: str):
            key = F.md5(F.concat(F.lit(seed), F.col("doc_id").cast("string")))
            rn = F.row_number().over(
                Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
            )
            return {
                (r.source, r.doc_id)
                for r in docs.select("source", "doc_id", rn.alias("rank"))
                .filter(F.col("rank") <= 5)
                .collect()
            }

        assert sample("seed42:") != sample("seed43:")
