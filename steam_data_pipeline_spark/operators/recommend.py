"""Recommendation operators (SURVEY.md §2.9 ``udf_recommender``;
VISUALIZATION_PLAN.md:69-70).

The reference plans two recommendation modes:

* content-based similarity over metadata (PLAN:69) — implemented as
  the token-Jaccard inverted-index join in ``plans/analytics.py``
  (`udf_recommender`) and the MinHash machinery in ``llm.dedup``;
* collaborative filtering (PLAN:70) — implemented here with
  ``pyspark.ml.recommendation.ALS`` on an implicit-feedback
  interaction matrix.

Fixture mapping: customers × parts with summed order quantities as
implicit strength (the steam analog: players × games with playtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from steam_data_pipeline_spark.operators.aggregates import dec_sum
from steam_data_pipeline_spark.sources.tables import read_table


def interaction_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, item, strength): customer × part with summed quantities.

    One shuffle per aggregation key; at 100 TB this is the standard
    map-side-combined groupBy.
    """
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(dec_sum("l_quantity").cast("float").alias("strength"))
    )


def als_recommendations(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    rank: int = 4,
    max_iter: int = 2,
    seed: int = 42,
    user_limit: int = 1000,
    num_blocks: int = 4,
    interactions: DataFrame | None = None,
) -> DataFrame:
    """Top-k item recommendations via implicit-feedback ALS for the
    ``user_limit`` most active users.

    ``max_iter=2`` is the bench-tuned demo setting (the third sweep
    roughly tripled wall for no change in the top-3 surface on the
    fixture); raise it for production factor quality.

    ``num_blocks`` sizes ALS's user/item factor blocks — the unit of
    its alternating-solve shuffles. Like shuffle partitions it is a
    cluster-sizing knob: 4 halves the fixture's fit+score wall versus
    the default 10 (fewer, fuller tasks on 600 k interactions); on a
    1000-executor cluster it would be hundreds.

    Seeded for run-to-run determinism; factors are distributed block
    matrices, so training scales with executors. Scoring is bounded
    deliberately: ``recommendForAllUsers`` is a users×rank · rank×items
    blocked cross product, so production calls score a user subset (or
    an ANN index over item factors) — here the top-N users by
    interaction count, the dashboard-shaped ask.
    """
    from pyspark.ml.recommendation import ALS

    # consumed twice (ALS fit + active-user ranking) — cache the
    # join+agg; callers that also need the matrix pass it in cached so
    # the orders⋈lineitem join runs once per query, not per use
    caller_owns_cache = interactions is not None
    if interactions is None:
        interactions = interaction_matrix(spark, sf_dir).cache()
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        seed=seed,
        implicitPrefs=True,
        userCol="user",
        itemCol="item",
        ratingCol="strength",
        coldStartStrategy="drop",
        numUserBlocks=num_blocks,
        numItemBlocks=num_blocks,
    )
    model = als.fit(interactions)
    active = (
        interactions.groupBy("user")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("user"))
        .limit(user_limit)
        .select("user")
        .localCheckpoint(eager=True)  # materialize while the cache is hot…
    )
    if not caller_owns_cache:
        interactions.unpersist(blocking=False)  # …then free the blocks
    recs = model.recommendForUserSubset(active, k)
    return recs.select(
        "user",
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user",
        (F.col("pos") + 1).cast("long").alias("rank"),
        F.col("rec.item").alias("item"),
    )
