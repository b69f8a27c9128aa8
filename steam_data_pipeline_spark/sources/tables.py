"""Parquet table readers for the driver testdata.

Design notes (100 TB posture):

* Explicit schemas — never schema inference on the pipeline path
  (SURVEY.md §1.3). Inference costs a footer-read fan-out per query and
  can drift; a declared ``StructType`` makes column pruning and filter
  pushdown reliable.
* ``events.ts`` is parquet TIMESTAMP(NANOS); Spark 4 reads it only as a
  raw int64 via ``spark.sql.legacy.parquet.nanosAsLong``. We convert
  ns→µs with integer ``div`` (NOT ``/`` — double division loses
  precision above 2^53, and epoch-nanos are ~1.7e18). The floor
  semantics match what DuckDB/pyarrow produce when they truncate the
  same nanos to microseconds, so differential tests stay value-exact.
* Readers return plain DataFrames; every downstream operator composes
  on lineage so Catalyst sees one end-to-end plan (pushdown + pruning
  reach the scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from steam_data_pipeline_spark import schemas
from steam_data_pipeline_spark.session import apply_runtime_confs

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its pinned schema.

    ``events`` comes back with ``ts`` already converted to
    TimestampType (µs, UTC session) — callers never see the raw nanos.
    """
    if name not in schemas.TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {schemas.TABLE_NAMES}")
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.schema(schemas.TESTDATA_SCHEMAS[name]).parquet(path)
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in schemas.TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view (for spark.sql access)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(prefix + name)
