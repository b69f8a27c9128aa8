"""The unified query registry — the engine's public query surface.

Every SURVEY.md §2 operator ID maps here to a Spark program and (where
SQL-expressible) a DuckDB oracle. ``__spark_entry__.py`` exposes this
registry to the driver.
"""

from __future__ import annotations

from steam_data_pipeline_spark.plans.analytics import ANALYTICS
from steam_data_pipeline_spark.plans.base import Query, SparkQuery
from steam_data_pipeline_spark.plans.core import CORE
from steam_data_pipeline_spark.plans.extensions import EXT

# Names that already have a green driver CORRECTNESS row (round 1 checked the
# first 50 registry entries). The driver caps the per-round check window, so we
# rotate: never-driver-verified queries go FIRST, previously-verified ones fill
# the tail. New queries (absent from this set) automatically sort to the front.
_DRIVER_VERIFIED_R1 = frozenset({
    "src_full_catalog", "src_paginated_limit", "src_top_selling",
    "src_most_played", "src_details_lookup", "src_timeseries_enrich",
    "sink_upsert_metadata", "sink_append_timeseries", "state_kv_rw",
    "api_read_sample", "proj_flatten_details", "proj_drop_col", "proj_tuple",
    "filt_valid_meta", "filt_pool_clean", "filt_anti_type", "pred_lock_expiry",
    "set_union_distinct_sort", "set_intersect_except", "agg_unpivot_daily",
    "limit_truncate", "limit_sample5", "topk_latest5", "topk_latest100",
    "batch_slicing", "agg_count_rows", "agg_streamer_count", "agg_daily_counts",
    "agg_roi_discount", "agg_minmax_validate", "agg_distinct_pool",
    "agg_corr_price_players", "agg_salted_daily", "agg_rollup_daily",
    "agg_pivot_daily_type", "smpl_deterministic", "agg_sliding_window",
    "agg_cube_daily_type", "agg_grouping_sets", "agg_percentiles_exact",
    "join_enrich_details", "join_enrich_facts", "join_dim_fact",
    "join_asof_latest", "join_interval_overlap", "join_range_binned",
    "join_asof_backward", "join_asof_forward", "join_semi_candidates",
    # agg_distinct_pool_approx was in the r1 window but errored (no_oracle);
    # now fixed with an exact oracle — keep it in the front rotation.
})

_ALL: dict[str, Query] = {}
for reg in (CORE, ANALYTICS, EXT):
    for name, q in reg.items():
        if name in _ALL:
            raise ValueError(f"duplicate query {name} across registries")
        _ALL[name] = q

_POS = {name: i for i, name in enumerate(_ALL)}
QUERIES: dict[str, Query] = {
    name: _ALL[name]
    for name in sorted(_ALL, key=lambda n: (n in _DRIVER_VERIFIED_R1, _POS[n]))
}


def query_map() -> dict[str, SparkQuery]:
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
