"""Analytical queries: joins (§2.3), windows (§2.6), scalar-function
suites (§2.7), and the UDF/UDAF-shaped surface (§2.9).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window, functions as F

from steam_data_pipeline_spark.operators import aggregates as agg
from steam_data_pipeline_spark.operators import joins as J
from steam_data_pipeline_spark.operators import windows as W
from steam_data_pipeline_spark.plans.base import Registry, ops_time_domain, t

ANALYTICS = Registry()

# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@ANALYTICS.add(
    "join_enrich_details",
    oracle="""
    WITH candidates AS (
      SELECT l_partkey FROM (
        SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS tq
        FROM lineitem GROUP BY l_partkey
      ) ORDER BY tq DESC, l_partkey LIMIT 100
    )
    SELECT p.p_partkey, p.p_name, p.p_brand, p.p_retailprice
    FROM part p JOIN candidates c ON p.p_partkey = c.l_partkey
    """,
    doc="Candidate keys ⋈ details, inner — missing detail drops the row (main.py:443-445).",
    tags=("join",),
)
def join_enrich_details(spark, sf_dir):
    played = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(agg.dec_sum("l_quantity").alias("tq"))
    )
    candidates = (
        played.orderBy(F.col("tq").desc(), F.col("l_partkey"))
        .limit(100)
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    details = t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )
    return J.enrich_details(candidates, details, "p_partkey")


@ANALYTICS.add(
    "join_enrich_facts",
    oracle="""
    WITH order_stats AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      FROM orders GROUP BY o_custkey
    ),
    activity AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT c.c_custkey, c.c_name,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.total_spent, 0.0) AS total_spent,
           COALESCE(a.n_events, 0) AS n_events
    FROM customer c
    LEFT JOIN order_stats o ON c.c_custkey = o.o_custkey
    LEFT JOIN activity a ON c.c_custkey = a.user_id
    """,
    doc=(
        "Multi-way LEFT enrichment with coalesce defaults: dim ⟕ orders-agg "
        "⟕ events-agg (main.py:322-374)."
    ),
    tags=("join",),
)
def join_enrich_facts(spark, sf_dir):
    customer = t(spark, sf_dir, "customer")
    order_stats = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            agg.dec_sum("o_totalprice").cast("double").alias("total_spent"),
        )
    )
    activity = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    enriched = J.enrich_facts(
        customer,
        [
            (order_stats, customer.c_custkey == order_stats.o_custkey),
            (activity, customer.c_custkey == activity.user_id),
        ],
        defaults={"n_orders": 0, "total_spent": 0.0, "n_events": 0},
    )
    return enriched.select(
        "c_custkey", "c_name", "n_orders", "total_spent", "n_events"
    )


@ANALYTICS.add(
    "join_dim_fact",
    oracle="""
    SELECT r.r_name,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc=(
        "Star-schema dim⋈fact chain with broadcast dims: revenue per region "
        "(main.py:94; PLAN:26-28 — TPC-H-style)."
    ),
    tags=("join", "agg", "flagship"),
)
def join_dim_fact(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = t(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    # try_cast: a price outside decimal(18,6)'s 12 integer digits is
    # out of the revenue domain -> NULL, not an ANSI crash (r12
    # numeric-extremes contract; TRY_CAST mirrored in the oracle)
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).try_cast(
        "decimal(18,6)"
    )
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(revenue).cast("double").alias("revenue"),
    )


@ANALYTICS.add(
    "join_asof_latest",
    oracle="""
    WITH latest AS (
      SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name, l.ts AS last_ts,
           l.event_type AS last_type, l.value AS last_value
    FROM customer c JOIN latest l ON c.c_custkey = l.user_id
    """,
    doc=(
        "As-of (latest) join: each key's most recent fact row attached to its "
        "dimension row (GUIDE:185-189)."
    ),
    tags=("join", "window"),
)
def join_asof_latest(spark, sf_dir):
    customer = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    latest = W.latest_per_key(
        t(spark, sf_dir, "events"), "user_id", "ts", tiebreak=["event_id"]
    )
    return customer.join(
        latest, customer.c_custkey == latest.user_id, "inner"
    ).select(
        "c_custkey",
        "c_name",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


_ISLANDS_SQL = """
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value > 100 THEN 1 ELSE 0 END AS flag
      FROM events
    ),
    changed AS (
      SELECT *, CASE WHEN lag(flag) OVER w IS NULL
                       OR lag(flag) OVER w <> flag THEN 1 ELSE 0 END AS chg
      FROM flagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS island_id
      FROM changed
    ),
    islands AS (
      SELECT user_id, island_id, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM tagged WHERE flag = 1
      GROUP BY user_id, island_id
    )
"""


@ANALYTICS.add(
    "join_interval_overlap",
    oracle=_ISLANDS_SQL
    + """
    SELECT i.user_id, CAST(i.island_id AS BIGINT) AS island_id,
           i.start_ts, i.end_ts, i.n_obs,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_nearby
    FROM islands i
    JOIN events e
      ON e.user_id = i.user_id
     AND e.ts BETWEEN i.start_ts - INTERVAL 30 MINUTE AND i.end_ts + INTERVAL 30 MINUTE
    GROUP BY i.user_id, i.island_id, i.start_ts, i.end_ts, i.n_obs
    """,
    doc=(
        "Range/interval join: facts against derived discount intervals "
        "(±30 min halo) — the ROI input join (PLAN:50-53)."
    ),
    tags=("join", "interval", "window"),
)
def join_interval_overlap(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    intervals = W.island_intervals(
        ev, "user_id", ["ts", "event_id"], F.col("value") > 100
    )
    i = intervals.select(
        F.col("user_id").alias("i_user"),
        F.col("island_id").cast("long").alias("island_id"),
        "start_ts",
        "end_ts",
        "n_obs",
    )
    cond = (
        (F.col("user_id") == F.col("i_user"))
        & (F.col("ts") >= F.col("start_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("ts") <= F.col("end_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return (
        ev.join(i, on=cond, how="inner")
        .groupBy("i_user", "island_id", "start_ts", "end_ts", "n_obs")
        .agg(F.count(F.lit(1)).alias("n_nearby"))
        .withColumnRenamed("i_user", "user_id")
    )


@ANALYTICS.add(
    "join_range_binned",
    oracle=_ISLANDS_SQL
    + """
    SELECT i.user_id, CAST(i.island_id AS BIGINT) AS island_id,
           i.start_ts, i.end_ts, i.n_obs,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_nearby
    FROM islands i
    JOIN events e
      ON e.user_id = i.user_id
     AND e.ts BETWEEN i.start_ts - INTERVAL 30 MINUTE AND i.end_ts + INTERVAL 30 MINUTE
    GROUP BY i.user_id, i.island_id, i.start_ts, i.end_ts, i.n_obs
    """,
    doc=(
        "Bin-bucketed range join: intervals exploded to 1-hour time bins, "
        "equi join on (key, bin), exact BETWEEN as residual — the 100 TB "
        "strategy when keys carry many points and many intervals; the "
        "oracle IS the plain range join, proving identical semantics."
    ),
    tags=("join", "interval", "skew"),
)
def join_range_binned(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    intervals = (
        W.island_intervals(ev, "user_id", ["ts", "event_id"], F.col("value") > 100)
        .withColumn("halo_start", F.col("start_ts") - F.expr("INTERVAL 30 MINUTES"))
        .withColumn("halo_end", F.col("end_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    joined = J.range_join_binned(
        ev.select("user_id", "ts", "event_id"),
        intervals,
        key="user_id",
        ts="ts",
        start="halo_start",
        end="halo_end",
        bin_seconds=3600,
    )
    return (
        joined.groupBy(
            "user_id",
            F.col("island_id").cast("long").alias("island_id"),
            "start_ts",
            "end_ts",
            "n_obs",
        )
        .agg(F.count(F.lit(1)).alias("n_nearby"))
    )


@ANALYTICS.add(
    "join_asof_backward",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      -- one row per (user, ts): equal-ts right rows are a tie BOTH
      -- engines break arbitrarily (DuckDB ASOF picks an unspecified
      -- peer; the window pick depends on sort stability) — collapse to
      -- MAX(value), the same row the Spark leg's tiebreak='value'
      -- (greatest wins, backward) selects (round-11 module review)
      SELECT user_id, ts, MAX(value) AS value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           v.value AS asof_value, v.ts AS asof_ts
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    doc=(
        "Generic backward as-of join (kdb/pandas merge_asof semantics): "
        "each purchase gets the latest prior view per key — union-tag + "
        "one window, not a range join; oracle is DuckDB's native ASOF "
        "JOIN. Equal-ts views are tie-broken deterministically (greatest "
        "value wins) on both legs."
    ),
    tags=("join", "asof", "window"),
)
def join_asof_backward(spark, sf_dir):
    from steam_data_pipeline_spark.operators.asof import asof_backward

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    return asof_backward(
        purchases,
        views,
        key="user_id",
        ts="ts",
        value_cols=["value"],
        tiebreak="value",  # greatest value wins on equal-ts views
    )


@ANALYTICS.add(
    "join_asof_forward",
    oracle="""
    WITH views AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
    ),
    purchases AS (
      -- deterministic equal-ts collapse, mirroring the backward
      -- variant: the forward pick is first/SMALLEST-tiebreak, so
      -- MIN(value) here matches the Spark leg's tiebreak='value'
      SELECT user_id, ts, MIN(value) AS value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT v.event_id, v.user_id, v.ts, v.value,
           p.value AS asof_value, p.ts AS asof_ts
    FROM views v
    ASOF LEFT JOIN purchases p
      ON v.user_id = p.user_id AND p.ts >= v.ts
    """,
    doc=(
        "Forward as-of join: each view gets the EARLIEST following "
        "purchase per key (time-to-conversion shape) — mirror of the "
        "backward variant; oracle is DuckDB's native forward ASOF JOIN. "
        "Equal-ts purchases are tie-broken deterministically (smallest "
        "value wins) on both legs."
    ),
    tags=("join", "asof", "window"),
)
def join_asof_forward(spark, sf_dir):
    from steam_data_pipeline_spark.operators.asof import asof_forward

    ev = t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_forward(
        views,
        purchases,
        key="user_id",
        ts="ts",
        value_cols=["value"],
        tiebreak="value",  # smallest value wins on equal-ts purchases
    )


@ANALYTICS.add(
    "join_semi_candidates",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
    doc="Semi-join reduction: only keys present in the pool (main.py:421,443).",
    tags=("join",),
)
def join_semi_candidates(spark, sf_dir):
    part = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    pool = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey")
    )
    return part.join(pool, on="p_partkey", how="left_semi")


@ANALYTICS.add(
    "join_anti_insert",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
    doc="Anti join: keys with no match — the upsert insert half (main.py:452-455).",
    tags=("join",),
)
def join_anti_insert(spark, sf_dir):
    part = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    pool = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey")
    )
    return J.anti_missing(part, pool, "p_partkey")


# ---------------------------------------------------------------------------
# §2.6 windows
# ---------------------------------------------------------------------------


@ANALYTICS.add(
    "win_rank_listing",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000
    """,
    doc="Ranked listing: rank position is meaningful output (main.py:261-272).",
    tags=("window", "topk"),
)
def win_rank_listing(spark, sf_dir):
    ranked = W.rank_by(
        t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )
    return (
        ranked.withColumn("rank", F.col("rank").cast("long"))
        .orderBy("rank")
        .limit(1000)
    )


@ANALYTICS.add(
    "win_latest_per_key",
    oracle="""
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Latest observation per key (GUIDE:185-189).",
    tags=("window",),
)
def win_latest_per_key(spark, sf_dir):
    return W.latest_per_key(
        t(spark, sf_dir, "events"), "user_id", "ts", tiebreak=["event_id"]
    ).select("user_id", "event_id", "ts", "value")


@ANALYTICS.add(
    "win_islands",
    oracle=_ISLANDS_SQL
    + """
    SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
           start_ts, end_ts, n_obs
    FROM islands
    """,
    doc=(
        "Gaps-and-islands sessionization: contiguous runs of the discount flag "
        "per key → interval table (PLAN:52)."
    ),
    tags=("window", "analytics", "flagship"),
)
def win_islands(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    intervals = W.island_intervals(
        ev, "user_id", ["ts", "event_id"], F.col("value") > 100
    )
    return intervals.select(
        "user_id",
        F.col("island_id").cast("long").alias("island_id"),
        "start_ts",
        "end_ts",
        "n_obs",
    )


@ANALYTICS.add(
    "win_sessionize_gap",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(TRY_CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
    doc=(
        "Time-gap sessionization: a new session when >30 min since the "
        "previous event per key — the batch-exact twin of the streaming "
        "session_window (§2.8), data-driven-gap sibling of win_islands."
    ),
    tags=("window", "session", "analytics"),
)
def win_sessionize_gap(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    tagged = W.gap_sessions(
        ev, "user_id", "ts", "30 MINUTES", tiebreak=["event_id"]
    )
    return tagged.groupBy(
        "user_id", F.col("session_id").cast("long").alias("session_id")
    ).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        agg.dec_sum("value").cast("double").alias("sum_value"),
    )


@ANALYTICS.add(
    "win_topn_per_key",
    oracle="""
    SELECT user_id, CAST(rn AS BIGINT) AS rn, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
    doc=(
        "Top-3 events by value per key — grouped top-N (GUIDE:188's "
        "recency sample generalized per key); Catalyst's WindowGroupLimit "
        "keeps n rows per key per task before the sort."
    ),
    tags=("window", "topk"),
)
def win_topn_per_key(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    top = W.topn_per_key(
        ev, "user_id", [F.col("value").desc(), F.col("event_id")], 3
    )
    return top.select(
        "user_id",
        F.col("rn").cast("long").alias("rn"),
        "event_id",
        "ts",
        "value",
    )


@ANALYTICS.add(
    "win_growth_rate",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CAST(SUM(TRY_CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS DOUBLE)
             / COUNT(TRY_CAST(value AS DECIMAL(18,2)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS trailing_avg
    FROM events
    """,
    doc=(
        "Trailing-frame baseline: avg of the previous 5 observations per key, "
        "current row excluded — the ROI denominator (PLAN:52)."
    ),
    tags=("window", "frame"),
)
def win_growth_rate(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, -1)
    )
    ev = t(spark, sf_dir, "events")
    v_dec = F.col("value").try_cast("decimal(18,2)")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (
            F.sum(v_dec).over(w).cast("double") / F.count(v_dec).over(w)
        ).alias("trailing_avg"),
    )


@ANALYTICS.add(
    "win_trailing_time_range",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CAST(SUM(TRY_CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(TRY_CAST(value AS DECIMAL(18,2)))
                 OVER (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS hourly_avg
    FROM events
    """,
    doc=(
        "Time-RANGE window frame: per-key average over the trailing 1 hour "
        "of event time (a row-count frame can't express this). Spark side "
        "orders by unix_micros so the range bound is µs-exact, matching the "
        "oracle's INTERVAL frame."
    ),
    tags=("window", "frame"),
)
def win_trailing_time_range(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    v_dec = F.col("value").try_cast("decimal(18,2)")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (
            F.sum(v_dec).over(w).cast("double") / F.count(v_dec).over(w)
        ).alias("hourly_avg"),
    )


@ANALYTICS.add(
    "win_pctrank_cumedist",
    oracle="""
    SELECT event_id, user_id, value,
           percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id) AS pct_rank,
           cume_dist()    OVER (PARTITION BY user_id ORDER BY value, event_id) AS cume
    -- NULL values excluded: the engines place NULLs at opposite ends
    -- of an ASC order (Spark FIRST, DuckDB LAST), so a NULL
    -- observation has no engine-stable distribution position
    FROM events WHERE value IS NOT NULL
    """,
    doc=(
        "Distribution-position windows: percent_rank + cume_dist of each "
        "observation within its key (PLAN:26 anomaly grid, 'where does "
        "this value sit historically') — one ordering, both functions, "
        "one shuffle; (k−1)/(n−1) and k/n divide identically in IEEE "
        "double on both engines."
    ),
    tags=("window", "rank"),
)
def win_pctrank_cumedist(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@ANALYTICS.add(
    "win_price_player_align",
    oracle="""
    SELECT event_id, user_id, ts, value,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
    doc="Aligned per-key series with lag/lead deltas (PLAN:28 combo chart).",
    tags=("window",),
)
def win_price_player_align(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("value").over(w).alias("next_value"),
    )


# ---------------------------------------------------------------------------
# §2.7 scalar-function suites
# ---------------------------------------------------------------------------


@ANALYTICS.add(
    "fn_scalar_suite",
    oracle="""
    SELECT p_partkey,
           TRIM(TRANSLATE(p_name, '™®', '')) AS name_norm,
           CONCAT_WS(', ', p_brand, p_type) AS brand_type,
           CAST(p_partkey AS VARCHAR) AS app_id,
           CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
           COALESCE(NULLIF(p_brand, ''), 'unknown') AS brand_or_default,
           LENGTH(p_name) AS name_len,
           CONTAINS(p_type, 'ECO') AS is_eco
    FROM part
    """,
    doc=(
        "Scalar suite: trim+translate (main.py:318-320), concat_ws "
        "(main.py:304-306), string cast (main.py:254), money scaling "
        "(main.py:362), coalesce defaults, contains (runner.py:40)."
    ),
    tags=("functions",),
)
def fn_scalar_suite(spark, sf_dir):
    from steam_data_pipeline_spark.functions.scalars import normalize_game_name

    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        normalize_game_name("p_name").alias("name_norm"),
        F.concat_ws(", ", "p_brand", "p_type").alias("brand_type"),
        F.col("p_partkey").cast("string").alias("app_id"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("price_cents"),
        F.coalesce(F.nullif("p_brand", F.lit("")), F.lit("unknown")).alias(
            "brand_or_default"
        ),
        F.length("p_name").cast("long").alias("name_len"),
        F.col("p_type").contains("ECO").alias("is_eco"),
    )


@ANALYTICS.add(
    "fn_datetime_suite",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_s,
           ts + INTERVAL 1 DAY AS next_day,
           CAST(hour(ts) AS BIGINT) AS hour_of_day,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
           date_trunc('day', ts) AS day
    FROM events
    """,
    doc=(
        "Datetime suite: ISO-8601 format (main.py:401), interval arithmetic "
        "(runner.py:75, main.py:393), epoch seconds, day truncation."
    ),
    tags=("functions", "datetime"),
)
def fn_datetime_suite(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_s"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("next_day"),
        F.hour("ts").cast("long").alias("hour_of_day"),
        # FLOOR of epoch seconds via exact integer micros: Spark's
        # unix_timestamp truncates a fractional PRE-EPOCH timestamp
        # toward zero (-2044997876) where DuckDB's FLOOR(epoch())
        # floors (-2044997877) — off by one on every negative-epoch
        # row with sub-second precision (r12 ts-extremes axis). pmod
        # gives the non-negative remainder, so the subtraction lands
        # on an exact multiple and the div is exact for any sign.
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 1000000))"
            " div 1000000"
        ).alias("epoch_s"),
        F.date_trunc("day", "ts").alias("day"),
    )


@ANALYTICS.add(
    "fn_rand_jitter",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS jitter_in_bounds
    FROM orders
    """,
    doc=(
        "Seeded-jitter demo (SURVEY §2.7 fn_rand_jitter; main.py:139 "
        "``4 + uniform(1, 3)``, runner.py:68). Spark's rand(seed) is "
        "deterministic per (seed, partition) but its values depend on "
        "partition layout, so the exact-checkable contract is the bound: "
        "every jitter lands in [5, 7). The query executes the rand path "
        "and returns (row count, all-in-bounds flag) — both exact."
    ),
    tags=("functions", "rand"),
)
def fn_rand_jitter(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    jitter = F.lit(4.0) + F.lit(1.0) + F.lit(2.0) * F.rand(seed=42)
    return (
        o.select(jitter.alias("jitter_s"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bool_and((F.col("jitter_s") >= 5.0) & (F.col("jitter_s") < 7.0)).alias(
                "jitter_in_bounds"
            ),
        )
        .select(F.col("n_rows").cast("long").alias("n_rows"), "jitter_in_bounds")
    )


# ---------------------------------------------------------------------------
# §2.9 UDF / UDAF / UDTF surface
# ---------------------------------------------------------------------------


@ANALYTICS.add(
    "udtf_forecast",
    oracle="""
    WITH numbered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS x
      -- |value| < 1e16: the fit's measure domain (r12 extremes
      -- contract), mirrored by the Spark leg's ingestion filter
      FROM events WHERE value IS NOT NULL AND ABS(value) < 1e16
        -- operational time domain (r13: pandas-path Arrow-ns contract)
        AND ts >= TIMESTAMP '1970-01-01' AND ts < TIMESTAMP '2100-01-01'
    ),
    sums AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,2))) AS DOUBLE) AS sxy
      FROM numbered GROUP BY user_id
    )
    , fitted AS (
      -- zero x-variance (n = 1) takes slope 0, matching the operator's
      -- documented n<2 semantics; the raw closed form would be 0/0 ->
      -- NULL here but a valid (0, y, y) fit on the Spark leg (round-11
      -- module review: divergence absent from fixtures, none of which
      -- have single-observation keys)
      SELECT user_id, n,  sy,
             CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                  ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx)
             END AS slope,
             sx
      FROM sums
    )
    SELECT user_id, n AS n_obs, slope,
           (sy - slope * sx) / n AS intercept,
           ((sy - slope * sx) / n) + slope * n AS forecast_next
    FROM fitted
    """,
    doc=(
        "Grouped-map applyInPandas per-key linear trend fit + 1-step forecast "
        "— the ARIMA/Prophet-shaped UDTF surface (PLAN:71); exact integer/"
        "decimal sums so the closed form is engine-independent."
    ),
    tags=("udf", "forecast"),
)
def udtf_forecast(spark, sf_dir):
    from steam_data_pipeline_spark.operators.forecast import linear_forecast_per_key

    # operational time domain: grouped-map pandas folds die on ns-
    # unrepresentable timestamps (r13 ts-extremes contract, base.py)
    return linear_forecast_per_key(ops_time_domain(t(spark, sf_dir, "events")))


@ANALYTICS.add(
    "udtf_forecast_seasonal",
    oracle="""
    WITH numbered AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS x
      -- |value| < 1e16: the fit's measure domain (r12 extremes
      -- contract), mirrored by the Spark leg's ingestion filter
      FROM events WHERE value IS NOT NULL AND ABS(value) < 1e16
        -- operational time domain (r13: pandas-path Arrow-ns contract)
        AND ts >= TIMESTAMP '1970-01-01' AND ts < TIMESTAMP '2100-01-01'
    ),
    sums AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT)) AS s,
             SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS q,
             arg_min(c, x) AS c_first,
             arg_max(c, x) AS c_last
      FROM numbered GROUP BY user_id
    ),
    lagged AS (
      SELECT user_id, SUM(CAST(c AS HUGEINT) * CAST(cl AS HUGEINT)) AS c01
      FROM (SELECT user_id, c,
                   lag(c) OVER (PARTITION BY user_id ORDER BY x) AS cl
            FROM numbered)
      WHERE cl IS NOT NULL GROUP BY user_id
    ),
    phase AS (
      SELECT user_id, x % 7 AS p,
             CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) / 100.0 / COUNT(*) AS m
      FROM numbered GROUP BY user_id, x % 7
    ),
    calc AS (
      SELECT s.user_id, s.n, s.c_last,
             CAST(s.s AS DOUBLE) / 100.0 / s.n AS mu,
             CASE
               WHEN s.n < 2
                 OR (CAST(s.n AS HUGEINT) * s.n * s.q
                     - CAST(s.n AS HUGEINT) * s.s * s.s) = 0
               THEN 0.0
               ELSE CAST(CAST(s.n AS HUGEINT) * s.n * COALESCE(l.c01, 0)
                         - CAST(s.n AS HUGEINT) * s.s
                           * ((s.s - s.c_last) + (s.s - s.c_first))
                         + (s.n - 1) * s.s * s.s AS DOUBLE)
                    / CAST(CAST(s.n AS HUGEINT) * s.n * s.q
                           - CAST(s.n AS HUGEINT) * s.s * s.s AS DOUBLE)
             END AS phi
      FROM sums s LEFT JOIN lagged l USING (user_id)
    )
    SELECT c.user_id, c.n AS n_obs, c.phi,
           COALESCE(pn.m, c.mu) AS season_next,
           COALESCE(pn.m, c.mu)
             + c.phi * (CAST(c.c_last AS DOUBLE) / 100.0
                        - COALESCE(pl.m, c.mu)) AS forecast_next
    FROM calc c
    LEFT JOIN phase pn ON pn.user_id = c.user_id AND pn.p = c.n % 7
    LEFT JOIN phase pl ON pl.user_id = c.user_id AND pl.p = (c.n - 1) % 7
    """,
    doc=(
        "Seasonal-mean + Yule-Walker AR(1) per-key forecast (PLAN:71 "
        "upgrade over udtf_forecast's pure linear trend): per-phase "
        "(x mod 7) means model the weekly cycle, a closed-form AR(1) "
        "coefficient over exact HUGEINT/bigint sums models persistence, "
        "forecast = m[next phase] + phi*(y_last - m[last phase]). Same "
        "grouped-map applyInPandas shape; exact-integer sums make the "
        "float closed form engine- and partitioning-independent."
    ),
    tags=("udf", "forecast"),
)
def udtf_forecast_seasonal(spark, sf_dir):
    from steam_data_pipeline_spark.operators.forecast import (
        seasonal_ar_forecast_per_key,
    )

    return seasonal_ar_forecast_per_key(
        ops_time_domain(t(spark, sf_dir, "events"))
    )


@ANALYTICS.add(
    "udf_potential_score",
    oracle="""
    SELECT p_partkey, p_name,
           p_retailprice * 0.3 + p_size * 2.0 AS potential_score
    FROM part
    WHERE p_type = 'ECONOMY'
    ORDER BY potential_score DESC, p_partkey LIMIT 50
    """,
    doc=(
        "Parameterized 'Potential Score' ranking over filter results (PLAN:48) "
        "— vectorized Pandas-UDF scoring path."
    ),
    tags=("udf", "topk"),
)
def udf_potential_score(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def score(price: pd.Series, size: pd.Series) -> pd.Series:
        return price * 0.3 + size.astype("float64") * 2.0

    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    scored = p.select(
        "p_partkey",
        "p_name",
        score(F.col("p_retailprice"), F.col("p_size")).alias("potential_score"),
    )
    return scored.orderBy(
        F.col("potential_score").desc(), F.col("p_partkey")
    ).limit(50)


@ANALYTICS.add(
    "udaf_fsum_value",
    oracle="""
    SELECT event_type,
           CAST(SUM(TRY_CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
    doc=(
        "Grouped-agg pandas UDAF (the missing §2.9 shape next to the "
        "grouped-map forecast): math.fsum is exactly-rounded, so the "
        "Python aggregate is order/partitioning-independent and "
        "value-exact against the decimal-sum oracle. UDAFs skip partial "
        "aggregation (full shuffle of values) — use built-ins on hot "
        "paths; this exists to exercise the surface with an exactness "
        "guarantee."
    ),
    tags=("udf", "udaf", "agg"),
)
def udaf_fsum_value(spark, sf_dir):
    import math

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def fsum_udaf(v: pd.Series) -> float:
        # SQL SUM semantics: NULLs (NaN in the Arrow batch) are
        # skipped, not propagated — math.fsum would return nan for a
        # group with ANY null (round-11 adversarial NULL sweep).
        # |x| < 1e16 is the oracle's DECIMAL(18,2) domain (r12
        # extremes contract): out-of-domain measures drop like NULLs,
        # and fsum raises "intermediate overflow" on ±1e308 inputs.
        vv = v.dropna()
        return math.fsum(vv[vv.abs() < 1e16])

    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        # grouped-agg pandas UDFs can't mix with JVM aggregates in one
        # agg(), so the count is a UDAF too
        return len(v)

    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        fsum_udaf(F.col("value")).alias("total_value"),
        count_udaf(F.col("value")).alias("n_events"),
    )


@ANALYTICS.add(
    "udf_recommender",
    oracle="""
    WITH toks AS (
      SELECT p_partkey, UNNEST(string_split(p_name, ' ')) AS tok,
             LEN(string_split(p_name, ' ')) AS n_tok
      FROM part
    ),
    pairs AS (
      SELECT a.p_partkey AS a, b.p_partkey AS b,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             ANY_VALUE(a.n_tok) AS na, ANY_VALUE(b.n_tok) AS nb
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.p_partkey < b.p_partkey
      WHERE a.p_partkey <= 20
      GROUP BY a.p_partkey, b.p_partkey
    )
    SELECT a, b,
           CAST(n_common AS DOUBLE) / (na + nb - n_common) AS similarity
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY a
        ORDER BY CAST(n_common AS DOUBLE) / (na + nb - n_common) DESC, b
      ) AS rn FROM pairs
    ) WHERE rn <= 3
    """,
    doc=(
        "Content-based recommender: token-overlap Jaccard over names via an "
        "inverted-index self-join, top-3 per query item (PLAN:69)."
    ),
    tags=("udf", "similarity"),
)
def udf_recommender(spark, sf_dir):
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.split("p_name", " ").alias("toks"),
        F.size(F.split("p_name", " ")).alias("n_tok"),
    )
    posting = p.select(
        "p_partkey", "n_tok", F.explode("toks").alias("tok")
    )
    a = posting.filter(F.col("p_partkey") <= 20).select(
        F.col("p_partkey").alias("a"), F.col("n_tok").alias("na"), "tok"
    )
    b = posting.select(
        F.col("p_partkey").alias("b"), F.col("n_tok").alias("nb"), "tok"
    )
    pairs = (
        a.join(b, on="tok")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.any_value("na").alias("na"),
            F.any_value("nb").alias("nb"),
        )
    )
    sim = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    w = Window.partitionBy("a").orderBy(sim.desc(), F.col("b"))
    return (
        pairs.withColumn("similarity", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("a", "b", "similarity")
    )


@ANALYTICS.add(
    "dim_scd2_history",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ch AS (
      -- null-safe change test, matching operators/windows.scd2_history:
      -- NULL is a distinct STATE (a non-NULL -> NULL transition is a
      -- real version), and rn=1 detects the first row even when its
      -- state is NULL (prev IS NULL can't; IS DISTINCT FROM alone
      -- misses a NULL-state first row)
      SELECT * FROM c WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL) AS is_current
    FROM ch
    """,
    doc=(
        "SCD type-2 dimension history: collapse the event stream into "
        "per-user state versions with valid_from/valid_to intervals and "
        "a current flag — the versioned-dimension view the upsert "
        "sink's last-writer-wins MERGE discards. One shuffle; both "
        "window passes share the (user_id, ts, event_id) exchange."
    ),
    tags=("window", "scd2", "dimension"),
)
def dim_scd2_history(spark, sf_dir):
    from steam_data_pipeline_spark.operators.windows import scd2_history

    ev = t(spark, sf_dir, "events")
    return scd2_history(ev, key="user_id", state="event_type", order=["ts", "event_id"])
