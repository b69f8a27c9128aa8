"""Frequency sketches for corpus statistics at 100 TB.

Three mergeable structures a training-data pipeline leans on when the
token/URL/domain vocabulary no longer fits anywhere:

* **Heavy hitters** (top-k frequent tokens) — the scale-safe two-pass
  shape: bounded-memory per-partition Misra-Gries/space-saving
  summaries produce a SMALL candidate set (≤ partitions × capacity),
  then one exact recount restricted to candidates. The full token
  frequency table is never shuffled; only candidates are. The
  Misra-Gries union guarantee makes the candidate set a provable
  superset of every token with count ≥ N/capacity, so with
  capacity ≥ k the global top-k (count ≥ N/k tokens) is never missed.
* **Count-min sketch** — sparse (depth, bucket, count) table built
  with one map-side-combined aggregation; mergeable across corpora by
  union + re-sum. Point estimates overcount only (est ≥ true;
  est ≤ true + 2N/width w.p. ≥ 1 − 2^-depth per probe).
* **Bloom filter** — fixed n_bits bit array packed into int64 words,
  built by one `bit_or` aggregation, probed via a broadcast join of
  the sparse word table. No false negatives; FPR ≈ (1 − e^(−hn/m))^h.

Reference parity: the reference pipeline (Jiawei57/steam-data-pipeline
main.py) has no sketch layer — these extend the engine for the
LLM-corpus brief (heavy-hitter token/domain stats, bloom-gated
benchmark decontamination) alongside the existing HLL / MinHash /
percentile sketches.

Everything here is JVM-side (built-in functions + higher-order
expressions); the only Python is the per-partition space-saving
summarizer, an Arrow-batched `mapInPandas` whose state is O(capacity).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F


def tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per token occurrence: lowercase whitespace tokenization
    (the corpus-wide convention shared with textstats / the DuckDB
    oracles)."""
    return docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token")
    ).filter(F.col("token") != "")


def heavy_hitters_exact(docs: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Exact top-k tokens (count desc, token asc tie-break) — one
    map-side-combined groupBy; the truth leg for the sketch path."""
    return (
        tokens(docs, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
    )


def _spacesaving_partitions(capacity: int):
    """Per-partition space-saving summarizer for `mapInPandas`.

    Classic Metwally et al. space-saving: at most `capacity` counters;
    an unseen token evicts the current minimum and inherits its count
    as error bound. The generator runs once per partition, so the
    counter dict persists across that partition's Arrow batches and
    memory stays O(capacity) regardless of partition size.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, list[int]] = {}  # token -> [count, error]
        for pdf in batches:
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok][0] += 1
                elif len(counters) < capacity:
                    counters[tok] = [1, 0]
                else:
                    evict = min(counters, key=lambda t: counters[t][0])
                    mn = counters.pop(evict)[0]
                    counters[tok] = [mn + 1, mn]
        yield pd.DataFrame(
            {
                "token": list(counters),
                "est": [v[0] for v in counters.values()],
                "err": [v[1] for v in counters.values()],
            }
        )

    return summarize


def heavy_hitter_candidates(
    docs: DataFrame, capacity: int, text_col: str = "text"
) -> DataFrame:
    """Bounded-memory candidate generation: per-partition space-saving
    summaries, unioned. ≤ n_partitions × capacity rows, each with its
    local (est, err) — a superset of every token whose global count
    exceeds N/capacity (Misra-Gries union guarantee)."""
    toks = tokens(docs, text_col)
    return toks.mapInPandas(
        _spacesaving_partitions(capacity),
        schema="token string, est long, err long",
    )


def heavy_hitters_sketched(
    docs: DataFrame, k: int, capacity: int, text_col: str = "text"
) -> DataFrame:
    """Two-pass heavy hitters: space-saving candidates, then ONE exact
    recount restricted to the candidate set (broadcast semi-join), then
    top-k. Returns exactly `heavy_hitters_exact` whenever every true
    top-k token clears the N/capacity candidate threshold — which the
    guarantee gives for capacity ≥ k·(heavy-hitter margin); the
    registered query asserts that equality in-query."""
    cands = heavy_hitter_candidates(docs, capacity, text_col).select("token").distinct()
    return (
        tokens(docs, text_col)
        .join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Count-min sketch (sparse table form)
# ---------------------------------------------------------------------------


def countmin_build(
    items: DataFrame, col: str, width: int, depth: int, seed: int = 7
) -> DataFrame:
    """Build a count-min sketch over an item stream as the SPARSE table
    ``(d, bucket, cnt)`` — the distributed-native CMS representation:
    one map-side-combined aggregation builds it, ``countmin_merge``
    unions two by re-summing, and the dense d×width array (for export
    to a single-node consumer) is just a pivot of this table.
    """
    rows = items.select(
        F.col(col).alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        "d",
        F.pmod(F.xxhash64("item", F.col("d") + F.lit(seed)), F.lit(width)).alias(
            "bucket"
        ),
    )
    return rows.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sparse CMS tables built with identical (width, depth,
    seed): union + re-sum. Exactly the dense elementwise addition."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, width: int, depth: int, seed: int = 7
) -> DataFrame:
    """Point-estimate each probe item: min over depth of its bucket
    counts. The sketch is broadcast (≤ depth × width rows by
    construction); absent buckets estimate 0."""
    keyed = probes.select(
        F.col(col).alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        "item",
        "d",
        F.pmod(F.xxhash64("item", F.col("d") + F.lit(seed)), F.lit(width)).alias(
            "bucket"
        ),
    )
    joined = keyed.join(F.broadcast(sketch), ["d", "bucket"], "left").select(
        "item", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("item").agg(F.min("cnt").cast("long").alias("est"))


# ---------------------------------------------------------------------------
# Bloom filter (int64-word bit array)
# ---------------------------------------------------------------------------


def _bloom_positions(col: Column, n_bits: int, n_hashes: int, seed: int) -> Column:
    """Array of n_hashes bit positions for a value (double hashing:
    h_i = h1 + i*h2 mod n_bits, the standard Kirsch-Mitzenmacher
    construction — two xxhash64 evaluations regardless of n_hashes)."""
    h1 = F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(seed + 1)), F.lit(n_bits - 1)) + F.lit(1)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.pmod(h1 + i * h2, F.lit(n_bits)),
    )


def bloom_build(
    items: DataFrame, col: str, n_bits: int, n_hashes: int = 5, seed: int = 11
) -> DataFrame:
    """Build a bloom filter over `items[col]` as a SPARSE word table
    ``(word_idx, bits)``: bit position p lives in int64 word p>>6 at
    bit p&63. One explode + one ``bit_or`` aggregation; mergeable by
    union + re-``bit_or``. Probing broadcasts this table (≤ n_bits/64
    rows), so membership tests never shuffle the probe side."""
    pos = items.select(
        F.explode(_bloom_positions(F.col(col), n_bits, n_hashes, seed)).alias("p")
    )
    return (
        pos.select(
            F.shiftright("p", 6).alias("word_idx"),
            # F.shiftleft only takes a literal shift — SQL's does not
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_dense(bloom: DataFrame, n_bits: int) -> list[int]:
    """Collect the sparse word table into the dense int64-word array.

    BOUNDED collect by construction: exactly n_bits/64 words regardless
    of how many items were inserted (the same doctrine as collecting
    IVF centroids) — a 2^20-bit bloom is 16K longs ≈ 128 KiB.
    """
    words = {int(r["word_idx"]): int(r["bits"]) for r in bloom.collect()}
    return [words.get(i, 0) for i in range((n_bits + 63) // 64)]


def bloom_contains(
    dense: list[int], col: Column, n_bits: int, n_hashes: int = 5, seed: int = 11
) -> Column:
    """MAP-SIDE membership test against a dense bloom word array
    embedded as an array literal: true iff all n_hashes bit positions
    are set. No join, no shuffle — the predicate rides the scan, which
    is the whole point of probing with a bloom instead of a join at
    100 TB."""
    try:
        arr = F.lit(dense)
    except Exception:  # pragma: no cover - older lit() without array support
        arr = F.array(*[F.lit(w) for w in dense])
    return F.forall(
        _bloom_positions(col, n_bits, n_hashes, seed),
        lambda p: (
            F.getbit(
                F.element_at(arr, (F.shiftright(p, 6) + F.lit(1)).cast("int")),
                p.bitwiseAND(F.lit(63)),
            )
            == 1
        ),
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    col: str,
    n_bits: int,
    n_hashes: int = 5,
    seed: int = 11,
) -> DataFrame:
    """Append ``might_contain`` to `probes`: true iff ALL n_hashes bit
    positions are set. The bloom word table is broadcast; the probe
    side streams through without a shuffle. Row cardinality is
    PRESERVED: the explode→regroup runs on a per-row surrogate id, so
    two identical probe rows come back as two rows (a payload-column
    groupBy would collapse them and corrupt downstream counts)."""
    with_id = probes.withColumn("__rid", F.monotonically_increasing_id())
    exploded = with_id.withColumn(
        "__p", F.explode(_bloom_positions(F.col(col), n_bits, n_hashes, seed))
    ).select(
        "__rid",
        *probes.columns,
        F.shiftright("__p", 6).alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(__p, 64) AS INT))").alias(
            "mask"
        ),
    )
    hit = exploded.join(F.broadcast(bloom), "word_idx", "left").withColumn(
        "__hit",
        F.coalesce(F.col("bits").bitwiseAND(F.col("mask")) != 0, F.lit(False)),
    )
    return (
        hit.groupBy("__rid")
        .agg(
            *[F.first(c).alias(c) for c in probes.columns],
            (F.count(F.lit(1)) == F.sum(F.col("__hit").cast("int"))).alias(
                "might_contain"
            ),
        )
        .drop("__rid")
    )
