"""Steam appdetails JSON flattening — the reference's richest
projection (main.py:296-313), on the full nested schema.

The reference receives ``{app_id: {success, data: {...nested...}}}``
per key and hand-flattens ~8 fields. Here the same semantics are one
``from_json`` + one ``select`` over ``schemas.APP_DETAILS``:

* envelope filter      — ``success == true``          (main.py:297)
* ``name``             — trimmed                      (main.py:301)
* ``release_date``     — raw display string, not date (main.py:303)
* ``developers[]``     — ", "-joined                  (main.py:304)
* ``publishers[]``     — ", "-joined                  (main.py:305)
* ``genres[].description`` — ", "-joined              (main.py:306)
* ``price_overview``   — carried struct, defaulted to
  ``{final_formatted: 'N/A', discount_percent: 0}``   (main.py:309-312)
* money                — minor units / 100 → Decimal  (main.py:362)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from steam_data_pipeline_spark import schemas
from steam_data_pipeline_spark.functions.scalars import (
    cents_to_money,
    join_str_array,
    join_struct_descriptions,
)

DEFAULT_PRICE = F.named_struct(
    F.lit("initial"), F.lit(None).cast("long"),
    F.lit("final"), F.lit(None).cast("long"),
    F.lit("currency"), F.lit(None).cast("string"),
    F.lit("discount_percent"), F.lit(0),
    F.lit("final_formatted"), F.lit("N/A"),
)


def parse_app_details(
    df: DataFrame, json_col: str = "payload", app_id_col: str = "app_id"
) -> DataFrame:
    """JSON string column → flat games_metadata-shaped rows + the
    carried price struct (the fetch-reuse at main.py:307-312,464)."""
    parsed = df.withColumn("__d", F.from_json(F.col(json_col), schemas.APP_DETAILS))
    ok = parsed.filter(F.col("__d.success") == True)  # noqa: E712 (null-safe: nulls drop)
    data = F.col("__d.data")
    return ok.select(
        F.col(app_id_col),
        F.trim(data["name"]).alias("name"),
        data["type"].alias("type"),
        data["release_date"]["date"].alias("release_date"),
        join_str_array(data["developers"]).alias("developer"),
        join_str_array(data["publishers"]).alias("publisher"),
        F.transform(data["genres"], lambda g: g["description"]).alias("genres_arr"),
        join_struct_descriptions(data["genres"]).alias("genres"),
        F.coalesce(data["price_overview"], DEFAULT_PRICE).alias("price_overview"),
    )


def timeseries_price_columns(price: Column) -> list[Column]:
    """price_overview struct → fact-table money columns (main.py:357-364):
    Decimal(10,2) from integer minor units, currency code, defaulted
    discount percent."""
    return [
        cents_to_money(price["initial"]).alias("price_numeric"),
        price["currency"].alias("price_currency"),
        F.coalesce(price["discount_percent"], F.lit(0)).alias("discount_percent"),
    ]
