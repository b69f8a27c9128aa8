from steam_data_pipeline_spark.sources.tables import load_all, read_table

__all__ = ["read_table", "load_all"]
