"""Core relational queries: sources/sinks (§2.1), projections/filters
(§2.2), set ops/limits/top-k (§2.4), aggregations (§2.5).

Fixture mapping follows FIXTURES.md §B: ``part`` plays the
games_metadata dimension, ``events`` the games_timeseries fact, ranked
order/lineitem scans play the two candidate listings.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from steam_data_pipeline_spark.operators import aggregates as agg
from steam_data_pipeline_spark.operators import relational as rel
from steam_data_pipeline_spark.operators.upsert import merge_upsert
from steam_data_pipeline_spark.plans.base import Registry, t

CORE = Registry()

# ---------------------------------------------------------------------------
# §2.1 scans / sources / sinks
# ---------------------------------------------------------------------------


@CORE.add(
    "src_full_catalog",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR) AS app_id
    FROM part WHERE p_partkey IS NOT NULL
    """,
    doc="Full-catalog scan: project key, cast to string, drop nulls (main.py:244-259).",
    tags=("source",),
)
def src_full_catalog(spark, sf_dir):
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey").isNotNull())
        .select(F.col("p_partkey").cast("string").alias("app_id"))
    )


@CORE.add(
    "src_paginated_limit",
    oracle="""
    SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 500
    """,
    doc="Paginated scan with client-side LIMIT: ordered scan, stop at n (main.py:215-242).",
    tags=("source", "limit"),
)
def src_paginated_limit(spark, sf_dir):
    return rel.topk(t(spark, sf_dir, "orders").select("o_orderkey"), ["o_orderkey"], 500)


@CORE.add(
    "src_top_selling",
    oracle="""
    SELECT CAST(o_custkey AS VARCHAR) AS app_id,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 500
    """,
    doc="Ranked top-sellers listing, position = rank (main.py:261-272).",
    tags=("source", "topk"),
)
def src_top_selling(spark, sf_dir):
    ranked = rel.ranked_topk(
        t(spark, sf_dir, "orders"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        500,
    )
    return ranked.select(
        F.col("o_custkey").cast("string").alias("app_id"),
        F.col("rank").cast("long").alias("rank"),
    )


@CORE.add(
    "src_most_played",
    oracle="""
    WITH played AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(l_partkey AS VARCHAR) AS app_id, total_qty,
           CAST(row_number() OVER (ORDER BY total_qty DESC, l_partkey) AS BIGINT) AS rank
    FROM played
    ORDER BY total_qty DESC, l_partkey
    LIMIT 100
    """,
    doc="Ranked most-played chart: top-100 keys by summed quantity (main.py:274-286).",
    tags=("source", "topk", "agg"),
)
def src_most_played(spark, sf_dir):
    played = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(agg.dec_sum("l_quantity").cast("double").alias("total_qty"))
    )
    ranked = rel.ranked_topk(
        played, [F.col("total_qty").desc(), F.col("l_partkey")], 100
    )
    return ranked.select(
        F.col("l_partkey").cast("string").alias("app_id"),
        "total_qty",
        F.col("rank").cast("long").alias("rank"),
    )


@CORE.add(
    "src_details_lookup",
    oracle="""
    WITH played AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_partkey
      ORDER BY total_qty DESC, l_partkey LIMIT 100
    )
    SELECT CAST(p.p_partkey AS VARCHAR) AS app_id, p.p_name AS name,
           p.p_brand AS developer, p.p_type AS type, played.total_qty
    FROM part p JOIN played ON p.p_partkey = played.l_partkey
    """,
    doc="Point lookups per candidate key ≡ broadcast join against details (main.py:288-316).",
    tags=("source", "join"),
)
def src_details_lookup(spark, sf_dir):
    played = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(agg.dec_sum("l_quantity").cast("double").alias("total_qty"))
    )
    candidates = rel.topk(played, [F.col("total_qty").desc(), F.col("l_partkey")], 100)
    part = t(spark, sf_dir, "part")
    return part.join(
        F.broadcast(candidates), part.p_partkey == candidates.l_partkey, "inner"
    ).select(
        F.col("p_partkey").cast("string").alias("app_id"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("developer"),
        F.col("p_type").alias("type"),
        "total_qty",
    )


@CORE.add(
    "src_timeseries_enrich",
    oracle="""
    WITH played AS (
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS player_count
      FROM lineitem GROUP BY l_partkey
    ),
    streams AS (
      SELECT user_id, CAST(LEAST(COUNT(*), 100) AS BIGINT) AS streamer_count
      FROM events GROUP BY user_id
    )
    SELECT CAST(p.p_partkey AS VARCHAR) AS app_id, p.p_name AS name,
           COALESCE(played.player_count, 0.0) AS player_count,
           COALESCE(streams.streamer_count, 0) AS streamer_count,
           p.p_retailprice AS price_numeric
    FROM part p
    LEFT JOIN played ON p.p_partkey = played.l_partkey
    LEFT JOIN streams ON (p.p_partkey - 1) % 150 = streams.user_id
    """,
    doc=(
        "Per-key fact enrichment: dim ⟕ players ⟕ streams (derived join key) "
        "with coalesce defaults (main.py:322-374)."
    ),
    tags=("source", "join"),
)
def src_timeseries_enrich(spark, sf_dir):
    part = t(spark, sf_dir, "part")
    played = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(agg.dec_sum("l_quantity").cast("double").alias("player_count"))
    )
    streams = agg.capped_count_per_key(
        t(spark, sf_dir, "events"), "user_id", 100, "streamer_count"
    )
    out = (
        part.join(played, part.p_partkey == played.l_partkey, "left")
        .join(streams, (part.p_partkey - 1) % 150 == streams.user_id, "left")
    )
    return out.select(
        F.col("p_partkey").cast("string").alias("app_id"),
        F.col("p_name").alias("name"),
        F.coalesce("player_count", F.lit(0.0)).alias("player_count"),
        F.coalesce("streamer_count", F.lit(0).cast("long")).alias("streamer_count"),
        F.col("p_retailprice").alias("price_numeric"),
    )


@CORE.add(
    "sink_upsert_metadata",
    oracle="""
    WITH updates AS (
      SELECT p_partkey, p_name, p_brand, p_retailprice + 1.0 AS p_retailprice
      FROM part WHERE p_partkey % 10 = 0
    )
    SELECT p_partkey, p_name, p_brand, p_retailprice FROM updates
    UNION ALL
    SELECT p.p_partkey, p.p_name, p.p_brand, p.p_retailprice
    FROM part p WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.p_partkey = p.p_partkey)
    """,
    doc=(
        "MERGE upsert: updated rows win per key, untouched keys survive "
        "(INSERT … ON CONFLICT DO UPDATE, main.py:451-457)."
    ),
    tags=("sink", "merge"),
)
def sink_upsert_metadata(spark, sf_dir):
    part = t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )
    updates = part.filter(F.col("p_partkey") % 10 == 0).withColumn(
        "p_retailprice", F.col("p_retailprice") + F.lit(1.0)
    )
    return merge_upsert(part, updates, key="p_partkey")


@CORE.add(
    "sink_append_timeseries",
    oracle="""
    WITH appended AS (
      SELECT event_id, event_type FROM events
      UNION ALL
      SELECT event_id + 10000000 AS event_id, event_type
      FROM events WHERE event_type = 'purchase'
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM appended GROUP BY event_type
    """,
    doc="Append-only fact sink: batch append then per-type counts (main.py:475).",
    tags=("sink",),
)
def sink_append_timeseries(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("event_id", "event_type")
    batch = ev.filter(F.col("event_type") == "purchase").withColumn(
        "event_id", F.col("event_id") + F.lit(10000000)
    )
    return (
        ev.unionByName(batch)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@CORE.add(
    "state_kv_rw",
    oracle="""
    WITH state(key, value) AS (
      VALUES ('is_scraping_active', 'false'), ('last_started_utc', '2024-01-01T00:00:00')
    ),
    writes(key, value) AS (
      VALUES ('is_scraping_active', 'true'), ('run_count', '1')
    )
    SELECT key, value FROM writes
    UNION ALL
    SELECT s.key, s.value FROM state s
    WHERE NOT EXISTS (SELECT 1 FROM writes w WHERE w.key = s.key)
    """,
    doc="KV lock/journal upsert: new value wins per key (main.py:387-404).",
    tags=("state",),
)
def state_kv_rw(spark, sf_dir):
    from steam_data_pipeline_spark.operators.state import kv_upsert

    state = spark.createDataFrame(
        [("is_scraping_active", "false"), ("last_started_utc", "2024-01-01T00:00:00")],
        "key string, value string",
    )
    writes = spark.createDataFrame(
        [("is_scraping_active", "true"), ("run_count", "1")],
        "key string, value string",
    )
    return kv_upsert(state, writes)


@CORE.add(
    "api_read_sample",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part ORDER BY p_partkey LIMIT 5
    """,
    doc="Read endpoint first-5 sample, made deterministic by key order (main.py:514-523).",
    tags=("limit",),
)
def api_read_sample(spark, sf_dir):
    return rel.topk(t(spark, sf_dir, "part"), ["p_partkey"], 5)


# ---------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# ---------------------------------------------------------------------------


@CORE.add(
    "proj_flatten_details",
    oracle="""
    SELECT event_id,
           -- malformed-JSON contract (r13 axis f): a corrupt props
           -- string behaves like NULL props on both legs (DuckDB's
           -- json_extract ERRORS on invalid JSON; the cast errors on
           -- non-numeric / out-of-BIGINT fields)
           TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS BIGINT) AS k_value,
           event_type
    FROM events
    """,
    doc="Nested JSON flatten: from_json + dot-path projection (main.py:299-313).",
    tags=("projection", "json"),
)
def proj_flatten_details(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    parsed = ev.withColumn("__p", F.from_json("props", "k LONG"))
    return parsed.select(
        "event_id", F.col("__p.k").alias("k_value"), "event_type"
    )


@CORE.add(
    "proj_drop_col",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value FROM events
    """,
    doc="Drop transient column before sink (main.py:449).",
    tags=("projection",),
)
def proj_drop_col(spark, sf_dir):
    return t(spark, sf_dir, "events").drop("props")


@CORE.add(
    "proj_tuple",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice FROM part
    """,
    doc="Narrow 3-column projection for the next stage (main.py:464).",
    tags=("projection",),
)
def proj_tuple(spark, sf_dir):
    return t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")


@CORE.add(
    "filt_valid_meta",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_name IS NOT NULL AND p_name <> ''
    """,
    doc="Drop null/empty-name records (main.py:445).",
    tags=("filter",),
)
def filt_valid_meta(spark, sf_dir):
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").isNotNull() & (F.col("p_name") != ""))
        .select("p_partkey", "p_name")
    )


@CORE.add(
    "filt_pool_clean",
    oracle="""
    SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS app_id
    FROM lineitem
    WHERE l_partkey IS NOT NULL AND LENGTH(CAST(l_partkey AS VARCHAR)) > 0
    """,
    doc="Falsy-id / null-row drop during scan (main.py:234,254,283,472).",
    tags=("filter",),
)
def filt_pool_clean(spark, sf_dir):
    ids = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("app_id")
    )
    return ids.filter(
        F.col("app_id").isNotNull() & (F.length("app_id") > 0)
    ).distinct()


@CORE.add(
    "filt_anti_type",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_non_game
    FROM part WHERE p_type <> 'ECONOMY'
    """,
    doc="Anti-predicate observability count: rows of unexpected type (main.py:467-469).",
    tags=("filter", "agg"),
)
def filt_anti_type(spark, sf_dir):
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") != "ECONOMY")
        .agg(F.count(F.lit(1)).alias("n_non_game"))
    )


@CORE.add(
    "pred_lock_expiry",
    oracle="""
    SELECT event_id, user_id, ts FROM events
    WHERE ts < (SELECT MAX(ts) - INTERVAL 2 HOUR FROM events)
    """,
    doc="Stale-lock interval predicate: older than now − 2 h (main.py:392-394).",
    tags=("filter", "interval"),
)
def pred_lock_expiry(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("__cutoff")
    )
    return (
        ev.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") < F.col("__cutoff"))
        .select("event_id", "user_id", "ts")
    )


# ---------------------------------------------------------------------------
# §2.4 set ops / dedup / sort / limit / top-k / batching
# ---------------------------------------------------------------------------

_POOL_SQL = """
    WITH top_selling AS (
      SELECT CAST(o_custkey AS VARCHAR) AS app_id
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 500
    ),
    most_played AS (
      SELECT CAST(l_partkey AS VARCHAR) AS app_id
      FROM (
        SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS tq
        FROM lineitem GROUP BY l_partkey
      ) ORDER BY tq DESC, l_partkey LIMIT 100
    ),
    pool AS (
      SELECT DISTINCT app_id FROM (
        SELECT app_id FROM top_selling UNION ALL SELECT app_id FROM most_played
      )
    )
"""


def _candidate_pool(spark, sf_dir):
    """The two ranked listings feeding the pipeline's signature op."""
    top_selling = rel.topk(
        t(spark, sf_dir, "orders"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        500,
    ).select(F.col("o_custkey").cast("string").alias("app_id"))
    played = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(agg.dec_sum("l_quantity").alias("tq"))
    )
    most_played = rel.topk(
        played, [F.col("tq").desc(), F.col("l_partkey")], 100
    ).select(F.col("l_partkey").cast("string").alias("app_id"))
    return top_selling, most_played


@CORE.add(
    "set_union_distinct_sort",
    oracle=_POOL_SQL
    + """
    SELECT app_id,
           CAST(row_number() OVER (ORDER BY app_id) AS BIGINT) AS pos
    FROM pool
    """,
    doc=(
        "The pipeline's signature op: union two ranked key lists, distinct, "
        "lexicographic string sort — '10' < '9' (main.py:421,254)."
    ),
    tags=("setop", "sort"),
)
def set_union_distinct_sort(spark, sf_dir):
    from steam_data_pipeline_spark.operators.windows import rank_by

    top_selling, most_played = _candidate_pool(spark, sf_dir)
    pool = rel.union_distinct_sort(top_selling, most_played, "app_id")
    return rank_by(pool, [F.col("app_id")], "pos").withColumn(
        "pos", F.col("pos").cast("long")
    )


@CORE.add(
    "set_intersect_except",
    oracle=_POOL_SQL
    + """
    SELECT app_id, 'both' AS membership FROM
      (SELECT app_id FROM top_selling INTERSECT SELECT app_id FROM most_played)
    UNION ALL
    SELECT app_id, 'top_selling_only' FROM
      (SELECT app_id FROM top_selling EXCEPT SELECT app_id FROM most_played)
    UNION ALL
    SELECT app_id, 'most_played_only' FROM
      (SELECT app_id FROM most_played EXCEPT SELECT app_id FROM top_selling)
    """,
    doc=(
        "INTERSECT / EXCEPT membership split of the two ranked key pools — "
        "completes the set-operation family next to the signature union "
        "(SURVEY §2.4; distinct semantics on both engines)."
    ),
    tags=("setop",),
)
def set_intersect_except(spark, sf_dir):
    top_selling, most_played = _candidate_pool(spark, sf_dir)
    both = top_selling.intersect(most_played).withColumn(
        "membership", F.lit("both")
    )
    sell_only = top_selling.subtract(most_played).withColumn(
        "membership", F.lit("top_selling_only")
    )
    play_only = most_played.subtract(top_selling).withColumn(
        "membership", F.lit("most_played_only")
    )
    return both.unionByName(sell_only).unionByName(play_only)


@CORE.add(
    "agg_unpivot_daily",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1
    )
    SELECT day, 'n_events' AS metric, n_events AS value FROM daily
    UNION ALL
    SELECT day, 'n_users' AS metric, n_users AS value FROM daily
    """,
    doc=(
        "Unpivot (wide→long melt) of the daily heartbeat's two measures — "
        "the inverse of agg_pivot_daily_type, for long-format dashboard "
        "feeds."
    ),
    tags=("agg", "unpivot"),
)
def agg_unpivot_daily(spark, sf_dir):
    daily = agg_daily_counts(spark, sf_dir)
    return daily.unpivot(
        ["day"], ["n_events", "n_users"], "metric", "value"
    )


@CORE.add(
    "limit_truncate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    ORDER BY l_orderkey, l_linenumber LIMIT 1000
    """,
    doc="Post-scan truncation [:limit] (main.py:242).",
    tags=("limit",),
)
def limit_truncate(spark, sf_dir):
    return rel.topk(
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        ["l_orderkey", "l_linenumber"],
        1000,
    )


@CORE.add(
    "limit_sample5",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    ORDER BY c_custkey LIMIT 5
    """,
    doc="First-5 sample with declared order (main.py:520; FIXTURES.md oracle note).",
    tags=("limit",),
)
def limit_sample5(spark, sf_dir):
    return rel.topk(
        t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment"),
        ["c_custkey"],
        5,
    )


@CORE.add(
    "topk_latest5",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 5
    """,
    doc="Recency top-k: ORDER BY timestamp DESC LIMIT 5 (GUIDE:188).",
    tags=("topk",),
)
def topk_latest5(spark, sf_dir):
    return rel.topk(
        t(spark, sf_dir, "events").drop("props"),
        [F.col("ts").desc(), F.col("event_id").desc()],
        5,
    )


@CORE.add(
    "topk_latest100",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
    doc="Latest-100 quality-sampling table (PLAN:26).",
    tags=("topk",),
)
def topk_latest100(spark, sf_dir):
    return rel.topk(
        t(spark, sf_dir, "events").drop("props"),
        [F.col("ts").desc(), F.col("event_id").desc()],
        100,
    )


@CORE.add(
    "batch_slicing",
    oracle=_POOL_SQL
    + """
    , numbered AS (
      SELECT app_id, row_number() OVER (ORDER BY app_id) - 1 AS rn FROM pool
    )
    SELECT CAST(rn // 20 AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM numbered GROUP BY 1
    """,
    doc="Deterministic fixed-size batching over the sorted key pool (main.py:432-433).",
    tags=("batch",),
)
def batch_slicing(spark, sf_dir):
    top_selling, most_played = _candidate_pool(spark, sf_dir)
    pool = rel.union_distinct_sort(top_selling, most_played, "app_id")
    batched = rel.batch_slices(pool, "app_id", 20)
    return batched.groupBy("batch_id").agg(F.count(F.lit(1)).alias("n_keys"))


# ---------------------------------------------------------------------------
# §2.5 aggregations
# ---------------------------------------------------------------------------


@CORE.add(
    "agg_count_rows",
    oracle="""
    SELECT 'part' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM part
    UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM orders
    UNION ALL SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem
    UNION ALL SELECT 'events', CAST(COUNT(*) AS BIGINT) FROM events
    """,
    doc="Validation row counts per table (GUIDE:181-182).",
    tags=("agg",),
)
def agg_count_rows(spark, sf_dir):
    parts = [
        agg.count_rows(t(spark, sf_dir, name), name)
        for name in ("part", "orders", "lineitem", "events")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@CORE.add(
    "agg_streamer_count",
    oracle="""
    SELECT user_id, event_type, CAST(LEAST(COUNT(*), 100) AS BIGINT) AS n_capped
    FROM events GROUP BY user_id, event_type
    """,
    doc="Per-key count with page-size cap: least(count, 100) (main.py:347,352).",
    tags=("agg",),
)
def agg_streamer_count(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.least(F.count(F.lit(1)), F.lit(100).cast("long")).alias("n_capped"))
    )


@CORE.add(
    "agg_daily_counts",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
    doc="Daily ingest heartbeat: records/day + active keys (PLAN:25).",
    tags=("agg", "flagship"),
)
def agg_daily_counts(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@CORE.add(
    "agg_roi_discount",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN value > 100 THEN TRY_CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
             / COUNT(CASE WHEN value > 100 THEN TRY_CAST(value AS DECIMAL(18,2)) END) AS avg_in,
           CAST(SUM(CASE WHEN NOT (value > 100) THEN TRY_CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
             / COUNT(CASE WHEN NOT (value > 100) THEN TRY_CAST(value AS DECIMAL(18,2)) END) AS avg_out,
           (CAST(SUM(CASE WHEN value > 100 THEN TRY_CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
             / COUNT(CASE WHEN value > 100 THEN TRY_CAST(value AS DECIMAL(18,2)) END))
           / (CAST(SUM(CASE WHEN NOT (value > 100) THEN TRY_CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
             / COUNT(CASE WHEN NOT (value > 100) THEN TRY_CAST(value AS DECIMAL(18,2)) END)) - 1.0 AS roi
    FROM events GROUP BY user_id
    """,
    doc=(
        "Discount-ROI conditional aggregate: avg value inside vs outside the "
        "flag, ratio − 1 (PLAN:50-53). Single pass, exact decimal sums."
    ),
    tags=("agg", "analytics"),
)
def agg_roi_discount(spark, sf_dir):
    return agg.conditional_roi(
        t(spark, sf_dir, "events"), "user_id", "value", F.col("value") > 100
    )


@CORE.add(
    "agg_minmax_validate",
    oracle="""
    SELECT 'events.value' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(value) AS BIGINT) AS n_nonnull,
           MIN(value) AS min_value, MAX(value) AS max_value,
           CAST(SUM(TRY_CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(TRY_CAST(value AS DECIMAL(18,2))) AS avg_value
    FROM events
    UNION ALL
    SELECT 'lineitem.l_quantity', CAST(COUNT(*) AS BIGINT), CAST(COUNT(l_quantity) AS BIGINT),
           MIN(l_quantity), MAX(l_quantity),
           CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(TRY_CAST(l_quantity AS DECIMAL(18,2)))
    FROM lineitem
    """,
    doc="Null/anomaly validation profile: min/max/avg/null-rate (PLAN:26).",
    tags=("agg", "validation"),
)
def agg_minmax_validate(spark, sf_dir):
    ev = agg.profile_column(t(spark, sf_dir, "events"), "value", "events.value")
    li = agg.profile_column(
        t(spark, sf_dir, "lineitem"), "l_quantity", "lineitem.l_quantity"
    )
    return ev.unionByName(li)


@CORE.add(
    "agg_distinct_pool",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_keys FROM lineitem
    """,
    doc="Candidate pool size after distinct (main.py:429-430).",
    tags=("agg",),
)
def agg_distinct_pool(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_keys")
    )


@CORE.add(
    "agg_corr_price_players",
    oracle="""
    WITH m AS (
      SELECT user_id,
             TRY_CAST(value AS DECIMAL(18,2)) AS x,
             -- malformed-JSON contract (r13 axis f)
             TRY_CAST(TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS BIGINT) AS DECIMAL(18,2)) AS y
      FROM events
    ),
    s AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(TRY_CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
             CAST(SUM(TRY_CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
             CAST(SUM(TRY_CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy
      FROM m GROUP BY user_id
    )
    SELECT user_id, n,
           (n * sxy - sx * sy)
             / (sqrt(GREATEST(n * sxx - sx * sx, 0.0))
                * sqrt(GREATEST(n * syy - sy * sy, 0.0))) AS corr_xy
    FROM s
    """,
    doc=(
        "Pearson correlation of the two aligned measures per key (PLAN:28 "
        "price-vs-players combo chart, quantified). Exact decimal moment "
        "sums → one deterministic float expression — partitioning-invariant, "
        "unlike a naive corr() over doubles."
    ),
    tags=("agg", "analytics"),
)
def agg_corr_price_players(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    x = F.col("value").try_cast("decimal(18,2)")
    y = (
        # try_cast (r13 malformed-JSON contract): an out-of-BIGINT or
        # non-numeric k field costs one NULL, not CAST_INVALID_INPUT
        F.get_json_object("props", "$.k")
        .try_cast("bigint")
        .try_cast("decimal(18,2)")
    )
    m = ev.select("user_id", x.alias("x"), y.alias("y"))
    n = F.count(F.lit(1))
    sx = F.sum("x").cast("double")
    sy = F.sum("y").cast("double")
    sxy = F.sum(
        (F.col("x") * F.col("y")).try_cast("decimal(28,4)")
    ).cast("double")
    sxx = F.sum(
        (F.col("x") * F.col("x")).try_cast("decimal(28,4)")
    ).cast("double")
    syy = F.sum(
        (F.col("y") * F.col("y")).try_cast("decimal(28,4)")
    ).cast("double")
    s = m.groupBy("user_id").agg(
        n.alias("n"), sx.alias("sx"), sy.alias("sy"),
        sxy.alias("sxy"), sxx.alias("sxx"), syy.alias("syy"),
    )
    # Zero-variance groups (n=1, or all values equal) need two guards
    # the fixtures never exercised (round-11 module review):
    # 1. clamp the variance terms at 0 before sqrt — double rounding
    #    can make n*sxx - sx² fractionally negative, and DuckDB ERRORS
    #    on sqrt(negative) (Spark would return NaN). The clamp fires
    #    identically on both legs (identical IEEE intermediates).
    # 2. try_divide, not / — Spark 4 runs ANSI mode, so 0.0/0.0 with a
    #    non-NULL numerator THROWS DIVIDE_BY_ZERO; try_divide returns
    #    NULL, which is exactly what DuckDB's x/0 yields.
    corr = F.try_divide(
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
        F.sqrt(
            F.greatest(
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
                F.lit(0.0),
            )
        )
        * F.sqrt(
            F.greatest(
                F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"),
                F.lit(0.0),
            )
        ),
    )
    return s.select("user_id", "n", corr.alias("corr_xy"))


@CORE.add(
    "agg_distinct_pool_approx",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_keys_exact,
           TRUE AS approx_within_5pct
    FROM lineitem
    """,
    doc=(
        "HyperLogLog++ candidate-pool cardinality — the documented scale "
        "swap for countDistinct (SURVEY §7 phase 4). DuckDB's sketch "
        "differs bit-wise, so the checkable contract is the exact count "
        "plus a boolean asserting the HLL estimate (rsd=0.01) landed "
        "within 5% of it — exact-oracle-checkable while still executing "
        "the approx path."
    ),
    tags=("agg", "approx"),
)
def agg_distinct_pool_approx(spark, sf_dir):
    # distinct once, then both aggregates over the distinct key set:
    # the HLL estimate is identical (same distinct input) and the plan
    # is one shuffle instead of a dual-distinct Expand
    keys = t(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    a = keys.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("n_keys_approx"),
        F.count(F.lit(1)).alias("n_keys_exact"),
    )
    within = (
        F.abs(F.col("n_keys_approx") - F.col("n_keys_exact"))
        <= 0.05 * F.col("n_keys_exact")
    )
    return a.select(
        F.col("n_keys_exact").cast("long").alias("n_keys_exact"),
        within.alias("approx_within_5pct"),
    )


@CORE.add(
    "agg_salted_daily",
    oracle="""
    SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
    doc=(
        "Two-phase SALTED daily count — skew-mitigation pattern whose "
        "semantics are provably identical to the plain groupBy (the oracle "
        "IS the plain GROUP BY). Salt = pmod(xxhash64(event_id), 16), "
        "deterministic under task retry."
    ),
    tags=("agg", "skew"),
)
def agg_salted_daily(spark, sf_dir):
    from steam_data_pipeline_spark.operators.skew import salted_agg

    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    return salted_agg(
        ev, ["day"], "event_id", {"n_events": ("count", None)}, n_salts=16
    )


@CORE.add(
    "agg_rollup_daily",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(TRY_CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY ROLLUP(1, event_type)
    """,
    doc="ROLLUP(day, type) dashboard extension of the daily heartbeat (SURVEY §2.5).",
    tags=("agg", "rollup"),
)
def agg_rollup_daily(spark, sf_dir):
    return agg.rollup_daily_by_type(t(spark, sf_dir, "events"), "ts", "event_type")


@CORE.add(
    "agg_pivot_daily_type",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error
    FROM events GROUP BY 1
    """,
    doc=(
        "Pivot: day × event_type count matrix via groupBy().pivot() with "
        "explicit (deterministic) pivot values — the dashboard wide format "
        "of the daily heartbeat."
    ),
    tags=("agg", "pivot"),
)
def agg_pivot_daily_type(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    types = ["view", "click", "signup", "purchase", "error"]
    pivoted = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    out = pivoted.select(
        "day",
        *[F.coalesce(F.col(t_), F.lit(0).cast("long")).alias(f"n_{t_}") for t_ in types],
    )
    return out


@CORE.add(
    "smpl_deterministic",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_id % 10 = 0
    """,
    doc=(
        "Deterministic decile sampling by key modulus — the reproducible "
        "alternative to TABLESAMPLE for validation workflows (PLAN:26 "
        "sampling grid at scale)."
    ),
    tags=("sample", "filter"),
)
def smpl_deterministic(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 10 == 0)
        .select("event_id", "user_id", "event_type", "value")
    )


@CORE.add(
    "agg_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 43200) AS BIGINT) - offs) * 43200 * 1000000
             ) AS win_start,
             value
      FROM events, (VALUES (0), (1)) AS o(offs)
    )
    SELECT win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(TRY_CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM starts
    GROUP BY win_start
    """,
    doc=(
        "Sliding-window aggregate: 1-day windows every 12 h (each event in "
        "size/slide = 2 windows) — the overlapping-window dashboard variant "
        "of the daily heartbeat; oracle enumerates the grid starts "
        "explicitly."
    ),
    tags=("agg", "window", "sliding"),
)
def agg_sliding_window(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            agg.dec_sum("value").cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
    )


@CORE.add(
    "agg_cube_daily_type",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY CUBE(1, event_type)
    """,
    doc=(
        "CUBE(day, type): all four grouping-set combinations in one pass — "
        "the dashboard slice-by-anything extension (SURVEY §2.5 note)."
    ),
    tags=("agg", "cube"),
)
def agg_cube_daily_type(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.cube(
        F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_events"))


@CORE.add(
    "agg_grouping_sets",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY GROUPING SETS ((date_trunc('day', ts)), (event_type))
    """,
    doc=(
        "Explicit GROUPING SETS ((day), (type)): exactly the two marginal "
        "rollups in one pass — the slice set CUBE/ROLLUP can't express "
        "(neither is a prefix of the other); completes the grouping-set "
        "family (SURVEY §2.5 note)."
    ),
    tags=("agg", "grouping-sets"),
)
def agg_grouping_sets(spark, sf_dir):
    # groupingSets resolves grouping columns by expression identity, so
    # materialize the derived day first and group by plain columns.
    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    return ev.groupingSets(
        [[F.col("day")], [F.col("event_type")]], F.col("day"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_events"))


@CORE.add(
    "agg_percentiles_exact",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents WHERE n_chars IS NOT NULL
    )
    SELECT lang,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN n_chars END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN n_chars END) AS p90,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN n_chars END) AS p99
    FROM ranked GROUP BY lang
    """,
    doc=(
        "Exact discrete percentiles (p50/p90/p99 of document length per "
        "lang) as order statistics: row_number + partition count over one "
        "(lang, n_chars) ordering — one shuffle, one sort; value-exact "
        "where percentile_approx (the documented 100 TB swap, "
        "llm_text_stats) is sketched."
    ),
    tags=("agg", "percentile", "validation"),
)
def agg_percentiles_exact(spark, sf_dir):
    # NULL n_chars carries no length information and the two engines
    # place NULLs at opposite ends of an ASC sort (Spark FIRST, DuckDB
    # LAST) — excluded from the order statistics on both legs, the
    # same convention DuckDB's own percentile functions use
    docs = (
        t(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .filter(F.col("n_chars").isNotNull())
    )
    w = Window.partitionBy("lang").orderBy("n_chars")
    # group sizes via map-side-combined groupBy + broadcast join, not
    # count() over an unordered window — that variant buffers each whole
    # partition in the window exec; row_number alone streams its frame
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # eqNullSafe: a NULL lang is a real percentile group (both engines'
    # window PARTITION BY and GROUP BY treat NULLs as one group) — a
    # plain equi-join here silently dropped it (round-11 NULL sweep)
    ranked = docs.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(counts.withColumnRenamed("lang", "__cl")),
        docs.lang.eqNullSafe(F.col("__cl")),
    ).drop("__cl")

    def at(p):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * F.lit(p)), F.col("n_chars")
            )
        )

    return ranked.groupBy("lang").agg(
        at(0.5).alias("p50"), at(0.9).alias("p90"), at(0.99).alias("p99")
    )


@CORE.add(
    "agg_percentiles_approx",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM documents WHERE n_chars IS NOT NULL GROUP BY lang
    """,
    doc=(
        "Mergeable-sketch quantiles — the 100 TB twin of "
        "agg_percentiles_exact, completing the exact/approx pattern "
        "symmetry agg_distinct_pool_approx set for distinct counts. "
        "percentile_approx's sketch partial-aggregates map-side and "
        "merges associatively (no global sort, unlike the exact order-"
        "statistics plan). DuckDB's sketch differs bit-wise, so the "
        "checkable contract is percentile_approx's DOCUMENTED rank-"
        "error guarantee, verified in-query against the actual data: "
        "for each p, the returned value's tie-aware rank interval "
        "[count(x<v)+1, count(x<=v)] must overlap p*n ± n/accuracy. "
        "Exact per-group counts anchor the row."
    ),
    tags=("agg", "percentile", "approx", "invariant"),
)
def agg_percentiles_approx(spark, sf_dir):
    accuracy = 1000
    ps = [0.5, 0.9, 0.99]
    docs = (
        t(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .filter(F.col("n_chars").isNotNull())  # same convention as exact
    )
    apx = docs.groupBy("lang").agg(
        F.percentile_approx("n_chars", ps, accuracy).alias("q"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    # eqNullSafe: keep the NULL-lang group (see agg_percentiles_exact)
    j = docs.join(
        F.broadcast(apx.withColumnRenamed("lang", "__cl")),
        docs.lang.eqNullSafe(F.col("__cl")),
    ).drop("__cl")
    aggs = []
    for i in range(len(ps)):
        v = F.col("q")[i]
        aggs.append(F.count(F.when(F.col("n_chars") < v, 1)).alias(f"__lo{i}"))
        aggs.append(F.count(F.when(F.col("n_chars") <= v, 1)).alias(f"__hi{i}"))
    checked = j.groupBy("lang", "n").agg(*aggs)
    # tolerance = the sketch's n/accuracy rank error + 1 for the
    # integer-rank rounding in "which exact rank does p*n mean" (e.g.
    # p99 of n=70 targets rank 69.3; both rank-69 and rank-70 answers
    # are exact by ceil/floor convention)
    tol = F.col("n").cast("double") / accuracy + F.lit(1.0)
    out_cols = [F.col("lang"), F.col("n")]
    for i, p in enumerate(ps):
        target = F.col("n").cast("double") * F.lit(p)
        ok = (
            (F.col(f"__lo{i}") + 1 <= target + tol)
            & (F.col(f"__hi{i}") >= target - tol)
        )
        out_cols.append(ok.alias(f"p{int(p * 100)}_ok"))
    return checked.select(*out_cols)
