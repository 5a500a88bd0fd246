"""The Yahoo Streaming Benchmark query, re-expressed over the driver's
testdata schema — one expression tree shared by batch and streaming.

Reference semantics (SURVEY.md §0, §2): filter → project → join with a
small static (relational) table → windowed keyed count + max(event_time)
(SparkYahooRunner.scala:71-83; YahooBenchmark.scala:218-242 on Flink;
sbx/test-yahoo.cpp:128-160 on StreamBox).

Mapping onto the testdata star schema (TESTDATA.md):
- events(event_id, ts, user_id, event_type, value, props)  ≙ YSB events
- customer(c_custkey, c_mktsegment, ...)                   ≙ campaigns dim
  (user_id → c_custkey plays ad_id → campaign_id; c_mktsegment plays
  campaign_id as the grouping attribute)
- filter event_type = 'view'                                (P1)
- project (user_id, ts)                                     (P2)
- broadcast inner join on the dim                           (J1/J2)
- tumbling event-time window, count(*) + max(ts)            (A1/W1)

The window length is a parameter; the reference uses 10 s. Output schema
honors the reference contract ``time_window LONG (epoch millis), key,
count LONG, lastUpdate TIMESTAMP`` (YahooBenchmark.scala:78-81 +
SparkYahooRunner.scala:124).

Scale posture: the only shuffle is the (window, segment) hash aggregate,
with map-side partial agg; the join never shuffles the fact side
(broadcast). Filter + 2-column projection reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streambench_spark.operators.relational import dim_join, filter_where, project
from streambench_spark.operators.windows import windowed_keyed_agg


def ysb_query(
    events: DataFrame,
    customer: DataFrame,
    window: str = "1 hour",
    event_type: str = "view",
) -> DataFrame:
    """filter → project → broadcast join → windowed count+max.

    Works on a batch DataFrame or a streaming one (stream-static join +
    streaming hash agg); callers add withWatermark upstream for streaming
    append mode.
    """
    filtered = filter_where(events, F.col("event_type") == event_type)
    projected = project(filtered, "user_id", "ts")
    dim = project(customer, F.col("c_custkey").alias("user_id"), "c_mktsegment")
    joined = dim_join(projected, dim, ["user_id"])
    out = windowed_keyed_agg(
        joined,
        ts_col="ts",
        duration=window,
        keys=["c_mktsegment"],
        aggs=[
            F.count(F.lit(1)).alias("count"),
            F.max(F.col("ts")).alias("last_update"),
        ],
    )
    return out.select(
        F.col("window_start").alias("time_window"),
        F.col("c_mktsegment").alias("segment"),
        F.col("count"),
        F.unix_millis(F.col("last_update")).alias("last_update_ms"),
    )


def ysb_oracle_sql(window_seconds: int = 3600, event_type: str = "view") -> str:
    """DuckDB-equivalent SQL for ysb_query (same column names/types).

    time_bucket carries an EXPLICIT epoch origin: DuckDB's default
    origin is 2000-01-03, Spark's window() aligns to 1970 — widths that
    divide the offset (3600, 10) mask the difference, any other width
    (e.g. 7 s) would shift every bucket."""
    return f"""
        SELECT
            epoch_ms(time_bucket(INTERVAL {window_seconds} SECOND, e.ts,
                                 TIMESTAMP '1970-01-01')) AS time_window,
            c.c_mktsegment AS segment,
            count(*) AS count,
            epoch_ms(max(e.ts)) AS last_update_ms
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        WHERE e.event_type = '{event_type}'
        GROUP BY 1, 2
    """
