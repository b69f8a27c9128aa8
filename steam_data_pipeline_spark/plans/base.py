"""Query-registry plumbing.

A ``Query`` pairs a Spark DataFrame program with (optionally) an ANSI
SQL oracle string that DuckDB runs on the same parquet tables. The
driver's correctness gate compares row-count + schema + an
order-insensitive value hash — so every registered query must be
**deterministic as a set of rows**: any LIMIT/top-k carries a total
order with explicit tie-breaks, all floating aggregates go through the
exact-decimal-sum discipline (operators.aggregates), and ranks are cast
to BIGINT on the Spark side to match DuckDB's window-function type.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from steam_data_pipeline_spark.sources.tables import read_table

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


class Registry(dict):
    def add(
        self,
        name: str,
        oracle: str | None,
        doc: str = "",
        tags: tuple[str, ...] = (),
    ):
        def deco(fn: SparkQuery) -> SparkQuery:
            if name in self:
                raise ValueError(f"duplicate query name {name}")
            self[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
            return fn

        return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table reader used by every registered query."""
    return read_table(spark, sf_dir, name)
