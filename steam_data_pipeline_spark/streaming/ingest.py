"""The end-to-end ingest pipeline — the reference's EP1 re-expressed.

Reference lifecycle (main.py:378-495, SURVEY.md §3 EP1):

    lock acquire → candidate gather (2 ranked scans) → union+distinct+
    sort → batch loop [ details fetch → filter → upsert dim ;
    enrich facts → filter → append fact ] → lock release

Spark shape: the candidate gather and enrichment are DataFrame lineage
(the "APIs" are fixture tables per FIXTURES.md); the batch loop
becomes either a single batch MERGE+append (``run_ingest_once``) or a
Structured Streaming ``foreachBatch`` loop (``run_ingest_stream``)
with the checkpoint acting as the run journal. The
metadata-upsert-before-fact-append ordering inside a batch mirrors
main.py:451-477.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from steam_data_pipeline_spark.operators.aggregates import capped_count_per_key, dec_sum
from steam_data_pipeline_spark.operators.relational import topk, union_distinct_sort
from steam_data_pipeline_spark.operators.state import FileRunJournal
from steam_data_pipeline_spark.operators.upsert import ParquetTableStore
from steam_data_pipeline_spark.sources.tables import read_table

DIM_TABLE = "games_metadata"
FACT_TABLE = "games_timeseries"


def gather_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two concurrent ranked scans → union+distinct+sort (main.py:411-421).

    'Concurrent' is free in Spark: both scans are branches of one DAG.
    """
    top_selling = topk(
        read_table(spark, sf_dir, "orders"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        500,
    ).select(F.col("o_custkey").cast("string").alias("app_id"))
    played = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(dec_sum("l_quantity").alias("tq"))
    )
    most_played = topk(played, [F.col("tq").desc(), F.col("l_partkey")], 100).select(
        F.col("l_partkey").cast("string").alias("app_id")
    )
    return union_distinct_sort(top_selling, most_played, "app_id")


def build_metadata(
    spark: SparkSession, sf_dir: str, candidates: DataFrame, now=None
) -> DataFrame:
    """Details lookup + flatten + validity filter → dimension rows
    (main.py:443-449): candidate keys ⋈ part-as-details, reference
    column shape (app_id, name, type, developer, …).

    ``now`` pins the update stamp to a literal Column for deterministic
    (oracle-checkable) composition; default is ingest wall-clock."""
    part = read_table(spark, sf_dir, "part")
    details = part.select(
        F.col("p_partkey").cast("string").alias("app_id"),
        F.trim(F.col("p_name")).alias("name"),
        F.col("p_type").alias("type"),
        F.col("p_brand").alias("developer"),
        F.col("p_retailprice").alias("retail_price"),
    )
    enriched = details.join(F.broadcast(candidates), on="app_id", how="inner")
    return enriched.filter(
        F.col("name").isNotNull() & (F.col("name") != "")
    ).withColumn(
        "metadata_last_updated",
        now if now is not None else F.current_timestamp(),
    )


def build_facts(spark: SparkSession, sf_dir: str, dim: DataFrame) -> DataFrame:
    """Fact enrichment (main.py:322-374): dim keys ⟕ player counts ⟕
    streamer counts with coalesce defaults, stamped with event time."""
    played = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").cast("string").alias("app_id"))
        .agg(dec_sum("l_quantity").cast("double").alias("player_count"))
    )
    streams = capped_count_per_key(
        read_table(spark, sf_dir, "events").withColumn(
            "app_id", F.col("user_id").cast("string")
        ),
        "app_id",
        100,
        "streamer_count",
    )
    facts = (
        dim.select("app_id", "retail_price")
        .join(played, on="app_id", how="left")
        .join(streams, on="app_id", how="left")
    )
    return facts.select(
        "app_id",
        F.current_timestamp().alias("timestamp"),
        F.col("retail_price").cast("decimal(10,2)").alias("price_numeric"),
        F.lit("USD").alias("price_currency"),
        F.coalesce("player_count", F.lit(0.0)).cast("int").alias("player_count"),
        F.coalesce("streamer_count", F.lit(0).cast("long"))
        .cast("int")
        .alias("streamer_count"),
    )


def run_ingest_once(
    spark: SparkSession,
    sf_dir: str,
    store: ParquetTableStore,
    journal: FileRunJournal | None = None,
) -> dict[str, int]:
    """One full pipeline run under the lock protocol (main.py:378-495).

    Returns per-stage row counts (the reference's per-batch
    observability logs, main.py:458,477)."""
    if journal is not None and not journal.acquire():
        return {"skipped": 1}
    try:
        candidates = gather_candidates(spark, sf_dir)
        n_pool = candidates.count()
        if n_pool == 0:  # empty-pool abort (main.py:423-425)
            return {"pool": 0}
        dim = build_metadata(spark, sf_dir, candidates)
        store.upsert(DIM_TABLE, dim, key="app_id", version_cols=["metadata_last_updated"])
        stored_dim = store.read(DIM_TABLE)
        facts = build_facts(spark, sf_dir, stored_dim)
        store.append_timeseries(FACT_TABLE, facts, key="app_id", ts="timestamp")
        return {
            "pool": n_pool,
            "dim_rows": store.read(DIM_TABLE).count(),
            "fact_rows": store.read(FACT_TABLE).count(),
        }
    finally:
        if journal is not None:
            journal.release()


def run_ingest_stream(
    spark: SparkSession,
    sf_dir: str,
    store: ParquetTableStore,
    checkpoint_dir: str,
) -> None:
    """Micro-batch flavor: the candidate/fact source consumed as a file
    stream, each micro-batch MERGE-upserted then appended via
    ``foreachBatch`` — upsert-before-append inside every batch, and the
    checkpoint provides single-active-query locking + restart recovery
    (SURVEY §2.8 stream_state_store / stream_exactly_once_upsert)."""
    from steam_data_pipeline_spark.sources.tables import read_events_stream

    ev = read_events_stream(spark, sf_dir, maxFilesPerTrigger="1")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        dim_rows = (
            batch_df.select(
                F.col("user_id").cast("string").alias("app_id"),
                F.col("event_type").alias("type"),
                F.col("ts").alias("metadata_last_updated"),
                F.col("event_id").alias("__version"),
            )
        )
        # Re-merge of a replayed batch is a no-op (max-version MERGE) —
        # idempotent under foreachBatch's at-least-once delivery.
        store.upsert(
            DIM_TABLE + "_stream",
            dim_rows,
            key="app_id",
            version_cols=["metadata_last_updated", "__version"],
        )
        fact_rows = batch_df.select(
            F.col("user_id").cast("string").alias("app_id"),
            F.col("ts").alias("timestamp"),
            F.col("value").alias("player_value"),
        )
        # Deterministic batch-id-keyed append: a replayed batch is
        # skipped, so the fact half is exactly-once too.
        store.append_batch(FACT_TABLE + "_stream", fact_rows, batch_id)

    # Bounded-retry wrapper (stream_retry_backoff): sink hiccups retry
    # on the reference's schedule before the batch is allowed to fail.
    from steam_data_pipeline_spark.streaming.retry import retrying_foreach_batch

    q = (
        ev.writeStream.foreachBatch(retrying_foreach_batch(apply_batch))
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
