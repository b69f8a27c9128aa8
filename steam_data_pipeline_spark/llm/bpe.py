"""Distributed BPE (byte-pair encoding) vocabulary induction.

Classic Sennrich et al. 2016 BPE, restructured for Spark's execution
model. The key scale observation: BPE never needs the corpus after the
first pass — it operates on the WORD-FREQUENCY table (distinct words ×
counts), which is orders of magnitude smaller than the corpus and stays
distributed here (at web scale it is still hundreds of millions of
rows — too big to collect, which is why the merge loop below runs as
Spark jobs over the vocab DataFrame rather than a driver-side dict).

Per merge iteration:
1. adjacent-pair counts — one explode + map-side-combined sum over the
   vocab table (weighted by word frequency);
2. argmax — a ONE-ROW collect (the merge decision itself, bounded by
   construction: count desc, pair-string asc tie-break);
3. apply the merge to every symbol array — a pure higher-order
   `aggregate` fold (greedy left-to-right non-overlapping, exactly
   Sennrich's replacement semantics), no Python;
4. every `checkpoint_every` iterations, `localCheckpoint` the vocab so
   the plan/lineage stays bounded across the loop.

Tokenizing a corpus with the learned merges is a broadcast join of the
final word→symbols table onto exploded corpus words — the corpus is
touched exactly twice total (word counting + tokenization), never
per-merge.

Reference parity: no analog in Jiawei57/steam-data-pipeline (text-only
ETL, no tokenizer); this implements the brief's "token counting (… a
BPE-ish regex)" end point properly: a real learned BPE vocabulary.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

#: separator inside pair keys. Non-printable (\x02) so no corpus word
#: can contain it — a printable "|" would let "a|b"+"c" alias "a"+"b|c"
#: in the pair-count groupBy.
PAIR_SEP = "\x02"

#: end-of-word sentinel. Non-printable prefix (\x01) so no corpus word
#: — and no sequence of merges over corpus characters — can ever equal
#: it; the classic "</w>" marker breaks round-trip on text that itself
#: contains "</w>". (\x00 is avoided: DuckDB VARCHARs reject NUL, and
#: the oracle recomputes these symbols.)
END = "\x01w"


@dataclass(frozen=True)
class Merge:
    rank: int
    a: str
    b: str
    count: int

    @property
    def merged(self) -> str:
        return self.a + self.b


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokenization — the only pass over
    the corpus the trainer makes."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def init_symbols(word_freq: DataFrame) -> DataFrame:
    """(word, freq, syms): characters plus the end-of-word marker —
    merges never cross word boundaries."""
    return word_freq.withColumn(
        "syms", F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    syms = F.col("syms")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.concat(
            F.element_at(syms, i), F.lit(PAIR_SEP), F.element_at(syms, i + 1)
        ),
    )
    return (
        vocab.filter(F.size(syms) >= 2)
        .select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right non-overlapping replacement of the
    adjacent pair (a, b) by a+b in every symbol array — a single
    `aggregate` fold per row, entirely JVM-side."""
    merged = a + b

    def step(acc, x):
        can_merge = (
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b)
        )
        return F.when(
            can_merge,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x)))

    return vocab.withColumn(
        "syms",
        F.aggregate(F.col("syms"), F.array().cast("array<string>"), step),
    )


def _safe_merge_batch(
    rows, min_count: int, saw_all_pairs: bool
) -> list[tuple[str, str, int]]:
    """From ONE collected top-K pair-count list (ordered cnt desc, pair
    asc), the maximal rank-order prefix that provably equals the
    sequential merge sequence. Safety argument, pair by pair:

    * Greedy replacement of (a, b) by ab leaves every pair DISJOINT
      from {a, b} with an exactly unchanged count (no adjacency of
      untouched symbols is created or destroyed), so an accepted pair's
      collected count IS its count at merge time.
    * Pairs touching an earlier batch symbol only lose count, and on a
      tie they rank after the candidate already (same cnt, larger
      string, else they'd precede it in the list) — but their NEW
      counts are unknown, so the scan must STOP (not skip) at the
      first touching pair: it may still be the true argmax.
    * Every pair CREATED by merging (a, b) contains the new symbol ab
      and each of its occurrences consumes an old (x, a) / (b, y) /
      (b, a) adjacency, so its count is bounded by an old count of a
      pair touching {a, b} — all of which rank BELOW the candidate
      (see previous point). A created pair's string is arbitrary, so
      it wins a tie: accept the candidate only if every touching pair
      below it (and, when the list was truncated at K, the K-th count
      as the bound on unseen pairs) is STRICTLY below the candidate's
      count.
    """
    split = [(r["pair"].partition(PAIR_SEP), int(r["cnt"])) for r in rows]
    parsed = [(a, b, cnt) for ((a, _, b), cnt) in split]
    accepted: list[tuple[str, str, int]] = []
    touched: set[str] = set()
    for i, (a, b, cnt) in enumerate(parsed):
        if cnt < min_count:
            break
        if touched:
            if a in touched or b in touched:
                break
            threat = max(
                (
                    c
                    for (x, y, c) in parsed[i + 1 :]
                    if x in touched or y in touched
                ),
                default=-1,
            )
            if not saw_all_pairs:
                threat = max(threat, parsed[-1][2])
            if threat >= cnt:
                break
        accepted.append((a, b, cnt))
        touched.update((a, b))
    return accepted


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 6,
    batch_topk: int = 24,
) -> tuple[list[Merge], DataFrame]:
    """Learn up to `n_merges` BPE merges; returns (merges, final vocab
    DataFrame (word, freq, syms)). Stops early when the best pair's
    weighted count drops below `min_count`.

    Each round collects the top ``batch_topk`` pairs in ONE job and
    applies the maximal provably-sequential prefix of them
    (:func:`_safe_merge_batch`), so the driver pays one pair-count
    aggregation per BATCH instead of per merge; ``batch_topk=1``
    recovers the classic one-merge-per-job loop. The learned merge
    sequence (pairs AND counts) is identical by construction."""
    vocab = init_symbols(word_frequencies(docs, text_col)).localCheckpoint(eager=True)
    merges: list[Merge] = []
    topk = max(1, batch_topk)
    while len(merges) < n_merges:
        rows = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(topk)
            .collect()
        )
        batch = _safe_merge_batch(rows, min_count, saw_all_pairs=len(rows) < topk)
        if not batch:
            break
        for a, b, cnt in batch[: n_merges - len(merges)]:
            merges.append(Merge(rank=len(merges), a=a, b=b, count=cnt))
            vocab = _apply_merge(vocab, a, b)
            if len(merges) % checkpoint_every == 0:
                vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def tokenize(docs: DataFrame, vocab: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tokens array<string>) — explode corpus words, broadcast
    join the learned word→symbols map, reassemble in word order. The
    merge loop never sees the corpus; this single join does."""
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    mapped = words.join(
        F.broadcast(vocab.select("word", "syms")), "word", "left"
    ).select(
        "doc_id",
        "pos",
        # unseen word (not in training vocab) → character fallback
        F.coalesce(
            F.col("syms"), F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
        ).alias("syms"),
    )
    return (
        mapped.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "syms"))
                    ),
                    lambda s: s["syms"],
                )
            ).alias("tokens")
        )
    )


def detokenize(toks: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """(doc_id, text) — inverse of :func:`tokenize` up to whitespace
    normalization: BPE symbols concatenate back to the original
    characters by construction (merges only ever glue adjacent
    symbols), and every word ends in the non-printable ``END`` sentinel
    (which no corpus character sequence can assemble), so one
    concat + sentinel→space substitution reassembles the document.
    Zero joins: a single projection over the token array."""
    return toks.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.concat_ws("", F.col(tokens_col)), END, " "
            )
        ).alias("text"),
    )
