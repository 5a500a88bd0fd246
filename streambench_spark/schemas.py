"""Canonical schemas — the data-model contract from SURVEY.md §1.3.

The YSB schemas mirror the reference case classes:
- ``Event``      ysb/benchmark/yahoo/Variables.scala:6-15
- ``CampaignAd`` ysb/benchmark/yahoo/Variables.scala:34-36
- ``Output``     ysb/benchmark/yahoo/Variables.scala:18-24 (+ lastUpdate,
  SparkYahooRunner.scala:124)

The testdata schemas match the driver-generated parquet in TESTDATA.md.
"""

from __future__ import annotations

from pyspark.sql import types as T

AD_TYPES = ["banner", "modal", "sponsored-search", "mail", "mobile"]  # Variables.scala:44
EVENT_TYPES = ["view", "click", "purchase"]  # Variables.scala:45

YSB_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("page_id", T.StringType()),
        T.StructField("ad_id", T.StringType()),
        T.StructField("ad_type", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("ip_address", T.StringType()),
    ]
)

YSB_CAMPAIGN_SCHEMA = T.StructType(
    [
        T.StructField("ad_id", T.StringType()),
        T.StructField("campaign_id", T.StringType()),
    ]
)

YSB_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("time_window", T.LongType()),  # epoch millis of window start
        T.StructField("campaign_id", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("lastUpdate", T.TimestampType()),
    ]
)

# --- driver testdata tables (TESTDATA.md) ---

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)
