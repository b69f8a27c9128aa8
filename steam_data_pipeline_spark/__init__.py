"""steam_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline ``Jiawei57/steam-data-pipeline``
(a Python/asyncio/PostgreSQL daily-batch ETL job) in idiomatic Spark:

* batch analytics on the DataFrame / Spark SQL API (Catalyst plans,
  whole-stage codegen, AQE),
* a fixture-fed micro-batch ingest path with MERGE-style upsert and
  append sinks (``operators.upsert``, ``streaming.ingest``),
* the reference's declared analytical workload (daily counts,
  latest-per-key as-of joins, discount-interval sessionization, ROI)
  as first-class queries (``plans.registry``),
* LLM-training-data operators (dedup, similarity search, text stats,
  multimodal columns) designed for 100 TB scale (``llm``).

The package never copies reference code; reference files are cited in
docstrings as ``main.py:NN`` for semantic parity only.
"""

from steam_data_pipeline_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
