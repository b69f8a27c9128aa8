from steam_data_pipeline_spark.functions.scalars import (
    cents_to_money,
    coalesce_default,
    iso_ts,
    normalize_game_name,
    normalize_game_name_pandas,
)

__all__ = [
    "normalize_game_name",
    "normalize_game_name_pandas",
    "cents_to_money",
    "coalesce_default",
    "iso_ts",
]
