from steam_data_pipeline_spark.plans.registry import QUERIES, Query, oracle_sql_map, query_map

__all__ = ["QUERIES", "Query", "query_map", "oracle_sql_map"]
