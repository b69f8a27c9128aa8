"""Set operations, dedup, sort, limit, top-k, batching (SURVEY.md §2.4).

The signature operator of the reference pipeline is
``sorted(list(set(top_selling_ids + most_played_ids)))`` (main.py:421):
UNION → DISTINCT → global ORDER BY over *string* keys. At scale this is
``union`` (no shuffle) → hash-distinct (one shuffle on the key) →
range-partitioned sort; Catalyst fuses distinct+sort into at most two
exchanges, and AQE coalesces the result.

String-key semantics matter: the reference casts appids to str
(main.py:254) so "10" < "9" lexicographically — we preserve, not "fix",
that order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def union_distinct_sort(a: DataFrame, b: DataFrame, key: str = "app_id") -> DataFrame:
    """UNION + DISTINCT + lexicographic ORDER BY (main.py:421).

    Inputs must both expose ``key`` as a string column. Returns one
    sorted column. The sort is a range-partitioned total order — valid
    on any cluster size; no driver collect.
    """
    pool = a.select(F.col(key).cast("string").alias(key)).unionByName(
        b.select(F.col(key).cast("string").alias(key))
    )
    return pool.distinct().orderBy(key)


def topk(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """Global top-k. Compiles to ``TakeOrderedAndProject`` — each task
    keeps a k-sized heap, only k·partitions rows reach the driver-side
    merge; never a full sort at scale (main.py:242 limit semantics,
    GUIDE:188 recency top-k)."""
    return df.orderBy(*order_cols).limit(k)


def ranked_topk(df: DataFrame, order_cols: list, k: int, rank_col: str = "rank") -> DataFrame:
    """Top-k with explicit rank position (ranked listings §2.1:
    ``src_top_selling`` — the scrape order *is* the rank).

    Implemented as limit-then-rank: ``TakeOrderedAndProject`` first so
    the window only runs over k rows, not the full table.
    """
    w = Window.orderBy(*order_cols)
    return topk(df, order_cols, k).withColumn(rank_col, F.row_number().over(w))


def batch_slices(df: DataFrame, key: str, batch_size: int, batch_col: str = "batch_id") -> DataFrame:
    """Deterministic fixed-size batching over the sorted key pool
    (main.py:432-433 ``candidate_app_ids[i:i+BATCH_SIZE]``).

    ``row_number`` over the key order, floor-divided by the batch size.
    The single-partition window is acceptable for a candidate *pool*
    (bounded, ~1e3 keys); for unbounded inputs use ``streaming.ingest``
    micro-batches instead.
    """
    w = Window.orderBy(F.col(key))
    return df.withColumn(
        batch_col, ((F.row_number().over(w) - F.lit(1)) / F.lit(batch_size)).cast("long")
    )


def dedup_last_writer(df: DataFrame, key: str, version_cols: list) -> DataFrame:
    """Keep exactly one row per key — the max by ``version_cols``
    (last-writer-wins, the in-batch half of the upsert at main.py:451-457).

    ``row_number`` (not dropDuplicates) so the surviving row is
    deterministic.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in version_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
