"""BPE trainer tests: exact merge-sequence equality against a
pure-Python reference implementation (Sennrich et al. 2016 semantics),
tokenization round-trip, early stop, and fold edge cases."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from steam_data_pipeline_spark.llm import bpe as B


def _ref_bpe(word_freqs: dict[str, int], n_merges: int, min_count: int = 2):
    """Reference BPE: dict-based, same tie-break (count desc,
    'a|b' string asc), greedy left-to-right non-overlapping apply."""
    vocab = {w: list(w) + [B.END] for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + f
                )
        if not counts:
            break
        best = min(
            counts.items(),
            key=lambda kv: (-kv[1], kv[0][0] + B.PAIR_SEP + kv[0][1]),
        )
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((rank, a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest newest newest"),
    (2, "newest newest widest widest widest"),
    (3, "low lower newest widest west west west"),
]


class TestTrainMatchesReference:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(CORPUS, "doc_id long, text string")

    def test_merge_sequence_exact(self, spark, docs):
        wf = {
            r["word"]: r["freq"]
            for r in B.word_frequencies(docs).collect()
        }
        ref_merges, ref_vocab = _ref_bpe(wf, n_merges=12)
        merges, vocab = B.train_bpe(docs, n_merges=12)
        assert [(m.rank, m.a, m.b, m.count) for m in merges] == ref_merges
        got = {r["word"]: list(r["syms"]) for r in vocab.collect()}
        assert got == ref_vocab

    def test_counts_nonincreasing(self, spark, docs):
        merges, _ = B.train_bpe(docs, n_merges=12)
        assert all(
            merges[i].count >= merges[i + 1].count
            for i in range(len(merges) - 1)
        )

    def test_early_stop(self, spark):
        docs = spark.createDataFrame(
            [(0, "ab cd ef")], "doc_id long, text string"
        )  # every pair unique → weighted counts of 1 → stop at min_count=2
        merges, _ = B.train_bpe(docs, n_merges=10)
        assert merges == []


class TestBatchedMergeSafety:
    """The top-K batched merge loop (round 14) must reproduce the
    one-merge-per-job sequence EXACTLY — pairs, counts, ranks — on
    shapes built to stress every guard in _safe_merge_batch."""

    def _assert_batched_eq_sequential(self, spark, texts, n_merges=12):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        seq_m, seq_v = B.train_bpe(docs, n_merges=n_merges, batch_topk=1)
        bat_m, bat_v = B.train_bpe(docs, n_merges=n_merges)  # default top-K
        assert [(m.rank, m.a, m.b, m.count) for m in bat_m] == [
            (m.rank, m.a, m.b, m.count) for m in seq_m
        ]
        seq = {r["word"]: list(r["syms"]) for r in seq_v.collect()}
        bat = {r["word"]: list(r["syms"]) for r in bat_v.collect()}
        assert bat == seq

    def test_chained_shared_symbols(self, spark):
        # 'the' chains t-h-e: after (t,h), the next best (th,e) is a
        # CREATED pair — the batch must stop rather than take a stale
        # list entry.
        self._assert_batched_eq_sequential(
            spark, ["the the the the then then hen hen he he"]
        )

    def test_count_ties_break_batch(self, spark):
        # every pair count tied: the strict threat guard must refuse
        # everything past the first merge in each round.
        self._assert_batched_eq_sequential(
            spark, ["ab ab ab cd cd cd ef ef ef gh gh gh"]
        )

    def test_random_corpora_match_reference(self, spark):
        import random

        for seed in (7, 13, 99):
            rng = random.Random(seed)
            alphabet = "abcdef"
            words = [
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
                for _ in range(40)
            ]
            text = " ".join(rng.choice(words) for _ in range(300))
            docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
            wf = {
                r["word"]: r["freq"] for r in B.word_frequencies(docs).collect()
            }
            ref_merges, _ = _ref_bpe(wf, n_merges=10)
            merges, _ = B.train_bpe(docs, n_merges=10)
            assert [(m.rank, m.a, m.b, m.count) for m in merges] == ref_merges, (
                f"seed {seed}"
            )

    def test_safe_batch_unit_guards(self):
        rows = [
            {"pair": f"a{B.PAIR_SEP}b", "cnt": 100},
            {"pair": f"c{B.PAIR_SEP}d", "cnt": 90},
            {"pair": f"x{B.PAIR_SEP}a", "cnt": 85},
        ]
        # disjoint, strictly above every touching pair → both accepted
        assert B._safe_merge_batch(rows, 2, saw_all_pairs=True) == [
            ("a", "b", 100),
            ("c", "d", 90),
        ]
        # touching pair ranked second → stop after one
        rows2 = [rows[0], rows[2], rows[1]]
        assert B._safe_merge_batch(rows2, 2, saw_all_pairs=True) == [
            ("a", "b", 100)
        ]
        # a touching pair TIES the candidate → created-pair threat,
        # stop after one
        rows3 = [
            {"pair": f"a{B.PAIR_SEP}b", "cnt": 100},
            {"pair": f"c{B.PAIR_SEP}d", "cnt": 90},
            {"pair": f"x{B.PAIR_SEP}a", "cnt": 90},
        ]
        assert B._safe_merge_batch(rows3, 2, saw_all_pairs=True) == [
            ("a", "b", 100)
        ]
        # truncated list: the K-th count bounds unseen pairs → the
        # second acceptance needs strict dominance over it
        rows4 = [
            {"pair": f"a{B.PAIR_SEP}b", "cnt": 100},
            {"pair": f"c{B.PAIR_SEP}d", "cnt": 90},
        ]
        assert B._safe_merge_batch(rows4, 2, saw_all_pairs=False) == [
            ("a", "b", 100)
        ]
        assert B._safe_merge_batch(rows4, 2, saw_all_pairs=True) == [
            ("a", "b", 100),
            ("c", "d", 90),
        ]
        # min_count cuts the batch, never the pairs before it
        rows5 = [
            {"pair": f"a{B.PAIR_SEP}b", "cnt": 3},
            {"pair": f"c{B.PAIR_SEP}d", "cnt": 1},
        ]
        assert B._safe_merge_batch(rows5, 2, saw_all_pairs=True) == [
            ("a", "b", 3)
        ]


class TestFoldEdgeCases:
    def test_overlapping_same_symbol(self, spark):
        """'xxxx' under merge (x,x): greedy left-to-right gives
        [xx, xx], never the overlapping [x, xx, x] readings."""
        docs = spark.createDataFrame(
            [(0, "xxxx xxxx xxxx")], "doc_id long, text string"
        )
        merges, vocab = B.train_bpe(docs, n_merges=1)
        assert (merges[0].a, merges[0].b) == ("x", "x")
        syms = vocab.collect()[0]["syms"]
        assert syms == ["xx", "xx", B.END]


class TestTokenize:
    def test_roundtrip_and_fallback(self, spark):
        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        _, vocab = B.train_bpe(docs, n_merges=8)
        new = spark.createDataFrame(
            [(9, "low newest zzz")], "doc_id long, text string"
        )  # zzz unseen → char fallback
        toks = B.tokenize(new, vocab).collect()[0]["tokens"]
        rebuilt = "".join(toks).replace(B.END, " ").strip()
        assert rebuilt == "low newest zzz"

    def test_tokens_shrink_known_words(self, spark):
        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        _, vocab = B.train_bpe(docs, n_merges=12)
        toks = B.tokenize(
            spark.createDataFrame([(1, "newest newest")], "doc_id long, text string"),
            vocab,
        ).collect()[0]["tokens"]
        # after 12 merges on this corpus, 'newest' is far fewer than
        # its 7 char+END symbols
        assert len(toks) < 2 * 7


class TestDetokenize:
    def test_sentinel_collision_text_roundtrips(self, spark):
        """A corpus word that literally contains '</w>' (the classic
        printable sentinel) must round-trip intact — the sentinel is
        non-printable precisely so no text can collide with it
        (round-7 advice fix). Same for '|' inside words vs PAIR_SEP."""
        from steam_data_pipeline_spark.llm.bpe import detokenize, tokenize, train_bpe

        docs = spark.createDataFrame(
            [(1, "tag</w>soup a|b a|b tag</w>soup end")],
            "doc_id long, text string",
        )
        _, vocab = train_bpe(docs, n_merges=4)
        out = detokenize(tokenize(docs, vocab)).collect()[0]["text"]
        assert out == "tag</w>soup a|b a|b tag</w>soup end"

    def test_pair_sep_no_aliasing(self, spark):
        """Distinct adjacent pairs must never alias in the pair-count
        groupBy even when symbols contain '|'."""
        import steam_data_pipeline_spark.llm.bpe as B

        docs = spark.createDataFrame(
            [(1, "a|bc a|bc ab|c")], "doc_id long, text string"
        )
        wf = B.word_frequencies(docs)
        pc = {
            r["pair"]: r["cnt"]
            for r in B._pair_counts(B.init_symbols(wf)).collect()
        }
        # with a printable '|' separator these two pairs would collide
        assert pc[f"a{B.PAIR_SEP}|"] == 2
        assert pc[f"|{B.PAIR_SEP}b"] == 2

    def test_roundtrip_with_fallback_and_whitespace(self, spark):
        from steam_data_pipeline_spark.llm.bpe import detokenize, tokenize, train_bpe

        train = spark.createDataFrame(
            [(1, "low lower lowest low low")], "doc_id long, text string"
        )
        _, vocab = train_bpe(train, n_merges=4)
        # doc 2 contains words never seen in training (char fallback)
        # and messy whitespace that must normalize to single spaces
        docs = spark.createDataFrame(
            [(1, "low lower"), (2, "  zebra   low\tunseen  ")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["text"]
            for r in detokenize(tokenize(docs, vocab)).collect()
        }
        assert out[1] == "low lower"
        assert out[2] == "zebra low unseen"
