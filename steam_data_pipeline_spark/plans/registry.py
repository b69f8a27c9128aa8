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

QUERIES: dict[str, Query] = {}
for reg in (CORE, ANALYTICS, EXT):
    for name, q in reg.items():
        if name in QUERIES:
            raise ValueError(f"duplicate query {name} across registries")
        QUERIES[name] = q


def query_map() -> dict[str, SparkQuery]:
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
