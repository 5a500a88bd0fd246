"""Synthetic data generators with the reference's generation semantics.

Reference parity (SURVEY.md §2.1):
- S1 rate-limited event source with ramp-up + round-robin attributes
  (YahooBenchmarkRunner.generateStream, ysb/benchmark/yahoo/
  YahooBenchmarkRunner.scala:68-98): rate source + modulo lookups into
  literal arrays — UDF-free, stays in whole-stage codegen.
- S6 Flink EventGenerator quirk (EventGenerator.scala:47-50): timestamp
  refreshed once per 1000 records → runs of identical timestamps;
  reproduced with floor(value/1000)-based stamping in deterministic mode.
- Campaign table: 10 ads per campaign (YahooBenchmark.scala:40-43); the
  reference Spark generator's ``spark.range(1, n)`` off-by-one (99
  campaigns instead of 100) is reproducible with ``exact=False``.

Determinism: test/batch mode stamps event_time FROM THE DATA (row index),
never from the wall clock, so goldens are stable (SURVEY.md §7.3). IDs are
UUID-shaped but seeded (md5 of a counter) — same cardinality and shape as
the reference's uuid4 without nondeterminism.

Scale posture: both generators are ``spark.range``/rate-source based —
embarrassingly parallel, no shuffle, no Python. 100 TB of synthetic events
is ``range(N).repartition(k)`` with the same expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streambench_spark.schemas import AD_TYPES, EVENT_TYPES


def _uuid_shaped(col):
    """Deterministic UUID-shaped string from a long column (md5-derived)."""
    h = F.md5(col.cast("string"))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def gen_campaigns(
    spark: SparkSession,
    num_campaigns: int = 100,
    ads_per_campaign: int = 10,
    exact: bool = True,
) -> DataFrame:
    """ad_id → campaign_id dim table, 10 ads per campaign.

    ``exact=False`` reproduces the reference generator's ``range(1, n)``
    off-by-one (YahooBenchmark.scala:40: 99 campaigns → 990 ads).
    """
    start = 1 if not exact else 0
    campaigns = spark.range(start, num_campaigns).select(
        _uuid_shaped(F.col("id") + F.lit(1_000_000)).alias("campaign_id"),
        F.col("id").alias("cidx"),
    )
    ads = campaigns.crossJoin(
        spark.range(ads_per_campaign).select(F.col("id").alias("aidx"))
    )
    return ads.select(
        _uuid_shaped(F.col("cidx") * ads_per_campaign + F.col("aidx")).alias("ad_id"),
        "campaign_id",
    )


def indexed_ads(campaigns: DataFrame) -> tuple[DataFrame, int]:
    """(ad dim with a dense 0..N-1 ``idx`` keyed by sorted ad_id, N).

    Delegates to replay.with_index — the shared dense-index idiom WITH
    its broadcastable-dim guard (a fact-sized frame raises instead of
    silently running a single-partition global sort). Returns the count
    too (one cheap job) so callers avoid a second pass.
    """
    from streambench_spark.sources.replay import with_index

    n = campaigns.count()
    return with_index(campaigns, "ad_id", precounted=n), n


def _derived_columns(value_col, deterministic_ts: bool,
                     base_ts: str = "2024-01-01 00:00:00",
                     events_per_second: int = 1000,
                     flink_ts_quirk: bool = False):
    """Row-index-derived generator expressions shared by batch and
    rate-source modes (YahooBenchmarkRunner.scala:90-97: fixed user/page
    UUID, modulo ad_type / event_type, constant ip). The ad_id itself
    comes from the broadcast dim join (see gen_events_batch) — never a
    driver-side collect into a literal array."""
    ad_type_array = F.array(*[F.lit(a) for a in AD_TYPES])
    event_type_array = F.array(*[F.lit(e) for e in EVENT_TYPES])
    if deterministic_ts:
        idx = F.floor(value_col / 1000) * 1000 if flink_ts_quirk else value_col
        ts = F.timestamp_seconds(
            F.unix_timestamp(F.lit(base_ts)) + (idx / events_per_second)
        )
    else:
        ts = F.current_timestamp()  # bench-only mode, like the reference S1
    return [
        F.lit("3a50d4a1-1b40-4fbb-bc18-2c3c3fb0d1a6").alias("user_id"),
        F.lit("8d0c5e52-9b57-4c54-97b2-1a53bfc0f0cf").alias("page_id"),
        F.element_at(ad_type_array, (F.pmod(value_col, len(AD_TYPES)) + 1).cast("int")).alias("ad_type"),
        F.element_at(event_type_array, (F.pmod(value_col, len(EVENT_TYPES)) + 1).cast("int")).alias("event_type"),
        ts.alias("event_time"),
        F.lit("255.255.255.255").alias("ip_address"),
    ]


def _attach_ads(keyed: DataFrame, campaigns: DataFrame, value_col: str) -> DataFrame:
    """value → ad_id via pmod index + broadcast dim join (the same
    shuffle-free pattern as replay.paced_replay); replaces the literal
    ad-array closure capture of the reference generator, which at large
    dim cardinalities is a driver bottleneck and a giant expression tree."""
    ads, n = indexed_ads(campaigns)
    keyed = keyed.withColumn("idx", F.pmod(F.col(value_col), F.lit(n)))
    return keyed.join(
        F.broadcast(ads.select("idx", "ad_id")), "idx"
    ).drop("idx")


def gen_events_batch(
    spark: SparkSession,
    campaigns: DataFrame,
    num_events: int,
    events_per_second: int = 1000,
    num_partitions: int | None = None,
    flink_ts_quirk: bool = False,
) -> DataFrame:
    """Deterministic bounded event table (test mode of S1/S6); carries
    ``event_idx`` (the generating row index) for oracle joins."""
    rng = spark.range(0, num_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    keyed = rng.select(
        F.col("id").alias("event_idx"),
        *_derived_columns(F.col("id"), True,
                          events_per_second=events_per_second,
                          flink_ts_quirk=flink_ts_quirk),
    )
    return _attach_ads(keyed, campaigns, "event_idx").select(
        "event_idx", "user_id", "page_id", "ad_id", "ad_type", "event_type",
        "event_time", "ip_address",
    )


def gen_events_stream(
    spark: SparkSession,
    campaigns: DataFrame,
    rows_per_second: int = 100_000,
    num_partitions: int = 8,
    ramp_up_seconds: int = 10,
    deterministic_ts: bool = False,
    flink_ts_quirk: bool = False,
) -> DataFrame:
    """S1: rate-limited streaming generator with ramp-up
    (YahooBenchmarkRunner.scala:84-97). Unbounded; event_time is
    current_timestamp() exactly like the reference (bench mode), or
    value-derived in deterministic mode — derived at rows_per_second so
    event time tracks the generation rate (a fixed 1000/s divisor would
    stretch a 10 s window across rows_per_second/1000 × 10 s of rows and
    stall watermarks). ad_id via broadcast dim join — no shuffle on the
    stream side."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("rampUpTime", f"{ramp_up_seconds}s")
        .option("numPartitions", num_partitions)
        .load()
    )
    keyed = stream.select(
        F.col("value"),
        *_derived_columns(
            F.col("value"),
            deterministic_ts,
            events_per_second=rows_per_second,
            flink_ts_quirk=flink_ts_quirk,
        ),
    )
    return _attach_ads(keyed, campaigns, "value").drop("value")
