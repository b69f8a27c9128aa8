"""Explicit StructType schemas.

Two families:

1. Reference-faithful steam schemas — what the reference's ORM declares
   (``games_metadata`` main.py:79-89, ``games_timeseries`` main.py:91-105,
   ``scraping_state`` main.py:107-111), mapped per SURVEY.md §1.3:
   DecimalType(10,2) for Numeric(10,2), TimestampType (UTC session) for
   TIMESTAMP(timezone=True), the surrogate autoincrement ``id`` dropped
   (identity = (app_id, timestamp)), and ``genres`` kept both as a
   canonical array and as the reference's comma-joined string.

2. Driver testdata schemas — the TPC-H-ish fixture tables in
   /root/testdata/sf*/ (TESTDATA.md), pinned explicitly so the pipeline
   path never relies on inference. ``events.ts`` is declared LongType
   because the files store parquet TIMESTAMP(NANOS); the reader converts
   to TimestampType with exact integer division (sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference-faithful schemas (steam shape)
# --------------------------------------------------------------------------

GAMES_METADATA = T.StructType(
    [
        T.StructField("app_id", T.StringType(), nullable=False),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        # raw display string, deliberately NOT a date (main.py:84,303)
        T.StructField("release_date", T.StringType()),
        T.StructField("developer", T.StringType()),
        T.StructField("publisher", T.StringType()),
        # canonical array + reference-faithful comma-joined projection
        T.StructField("genres_arr", T.ArrayType(T.StringType())),
        T.StructField("genres", T.StringType()),
        T.StructField("tags", T.StringType()),  # declared, never populated (main.py:88)
        T.StructField("metadata_last_updated", T.TimestampType()),
    ]
)

GAMES_TIMESERIES = T.StructType(
    [
        T.StructField("app_id", T.StringType(), nullable=False),
        T.StructField("timestamp", T.TimestampType(), nullable=False),
        T.StructField("price_numeric", T.DecimalType(10, 2)),
        T.StructField("price_currency", T.StringType()),
        T.StructField("discount_percent", T.IntegerType()),
        T.StructField("player_count", T.IntegerType()),
        T.StructField("streamer_count", T.IntegerType()),
    ]
)

SCRAPING_STATE = T.StructType(
    [
        T.StructField("key", T.StringType(), nullable=False),
        T.StructField("value", T.StringType()),
    ]
)

# Nested shape of the Steam appdetails payload the reference flattens
# (main.py:296-313): price_overview struct inside a success envelope.
PRICE_OVERVIEW = T.StructType(
    [
        T.StructField("initial", T.LongType()),
        T.StructField("final", T.LongType()),
        T.StructField("currency", T.StringType()),
        T.StructField("discount_percent", T.IntegerType()),
        T.StructField("final_formatted", T.StringType()),
    ]
)

APP_DETAILS = T.StructType(
    [
        T.StructField("success", T.BooleanType()),
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("type", T.StringType()),
                    T.StructField(
                        "release_date",
                        T.StructType([T.StructField("date", T.StringType())]),
                    ),
                    T.StructField("developers", T.ArrayType(T.StringType())),
                    T.StructField("publishers", T.ArrayType(T.StringType())),
                    T.StructField(
                        "genres",
                        T.ArrayType(
                            T.StructType(
                                [T.StructField("description", T.StringType())]
                            )
                        ),
                    ),
                    T.StructField("price_overview", PRICE_OVERVIEW),
                ]
            ),
        ),
    ]
)

# --------------------------------------------------------------------------
# Driver testdata schemas (as stored on disk)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

# ts on disk: parquet TIMESTAMP(NANOS) → read as raw int64 (nanosAsLong)
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS_RAW,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)
