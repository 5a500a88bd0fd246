"""Time-window operators — in the reference, "window" always means event-time
windows (SURVEY.md §2.5); no OVER-clause functions exist there.

Reference parity:
- W1 tumbling window   window($"event_time","10 seconds")  SparkYahooRunner.scala:75;
  Flink TumblingEventTimeWindows YahooBenchmark.scala:166; sbx WinGBK test-yahoo.cpp:150
- W2 session window    sbx SessionWindow merge semantics   sbx/Values.h:1414-1688
- W3 sliding/accumulating windows (WinSum_* window-count arg, test-yahoo.cpp:139,141)
- A1/A3 windowed keyed agg (count+max)                      SparkYahooRunner.scala:75-83
- A4 windowed global sum (WinSum_addlong)
- A5 windowed distinct count (WinSum_mergeset, sbx/Values.h:2190-2208)
- A6 windowed collect-to-vector (WinSum_mergevector)

All builders emit ``window_start`` as epoch millis (LongType) to honor the
reference output schema (``time_window LONG`` — YahooBenchmark.scala:78-81)
and keep oracle hashing exact (no timestamp formatting ambiguity).

Scale notes: groupBy(window, key) is a hash aggregate with map-side partial
aggregation; the shuffle key is (window, key) so skew only arises from hot
keys, which AQE skew-join/salting handles. State in streaming is bounded by
``withWatermark`` upstream of these builders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window(ts_col: str, duration: str) -> Column:
    """W1. Epoch-aligned fixed windows, identical semantics to DuckDB
    time_bucket(INTERVAL duration, ts)."""
    return F.window(F.col(ts_col), duration)


def sliding_window(ts_col: str, duration: str, slide: str) -> Column:
    """W3. Each row lands in duration/slide overlapping windows."""
    return F.window(F.col(ts_col), duration, slide)


def windowed_keyed_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    slide: str | None = None,
) -> DataFrame:
    """A1/A2/A3: THE YSB aggregation shape — per (window, key) aggregate.

    Catalyst plans HashAggregate(partial) → shuffle → HashAggregate(final),
    which is exactly the reference's partial+final pattern (Flink fold
    YahooBenchmark.scala:229-242; StreamBox WinGBK→WinKeyReducer).
    """
    win = (
        tumbling_window(ts_col, duration)
        if slide is None
        else sliding_window(ts_col, duration, slide)
    )
    return (
        df.groupBy(win.alias("w"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .withColumn("window_start", F.unix_millis(F.col("w.start")))
        .drop("w")
    )


def windowed_global_agg(
    df: DataFrame, ts_col: str, duration: str, aggs: list[Column]
) -> DataFrame:
    """A4: WinSum_addlong — per-window aggregate, no key."""
    return (
        df.groupBy(tumbling_window(ts_col, duration).alias("w"))
        .agg(*aggs)
        .withColumn("window_start", F.unix_millis(F.col("w.start")))
        .drop("w")
    )


def windowed_distinct_count(
    df: DataFrame,
    ts_col: str,
    duration: str,
    col: str,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """A5: WinSum_mergeset. Exact in batch; ``exact=False`` uses HLL
    (approx_count_distinct) which is the streaming-safe / 100 TB path —
    the reference's 16-way sharded set (creek_set_array) is the same
    contention-avoidance idea Spark gets from partial aggregation.
    """
    agg = (
        F.count_distinct(F.col(col)) if exact else F.approx_count_distinct(F.col(col), rsd)
    ).alias("distinct_count")
    return windowed_global_agg(df, ts_col, duration, [agg])


def windowed_collect(
    df: DataFrame, ts_col: str, duration: str, col: str, sort: bool = True
) -> DataFrame:
    """A6: WinSum_mergevector — gather all values per window.

    ``sort=True`` wraps in sort_array for deterministic output (the
    reference's concurrent_vector is unordered; tests need determinism).
    """
    collected = F.collect_list(F.col(col))
    if sort:
        collected = F.sort_array(collected)
    return windowed_global_agg(df, ts_col, duration, [collected.alias("collected")])


def session_windowed_agg(
    df: DataFrame,
    ts_col: str,
    gap: str | Column,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """W2: session windows with gap-merge semantics (sbx/Values.h:1414-1688
    try_add_record/merge). Spark's session_window implements the same
    extend-on-overlap + merge-adjacent model natively. ``gap`` may be a
    per-row Column (dynamic gap) — session_window accepts both.
    """
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.unix_millis(F.col("w.start")))
        .withColumn("session_end", F.unix_millis(F.col("w.end")))
        .drop("w")
    )


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    count_alias: str = "n_events",
    sum_col: Column | None = None,
    sum_alias: str = "sum_cents",
    levels: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style multi-resolution rollup (TimescaleDB continuous
    aggregates): bucket raw events at the finest granularity once, then
    derive every coarser level by re-aggregating the NEXT-FINER level —
    never re-scanning raw data.

    Scale posture: the raw table is touched by exactly one shuffle (the
    finest groupBy, with map-side partials); each coarser level
    aggregates the previous rollup, whose cardinality is orders of
    magnitude smaller (minutes → hours is a 60× reduction), so levels
    2..k are effectively free. This is the plan shape a continuous
    aggregate maintains incrementally at 100 TB — the batch expression
    of it is this cascade. Aggregates must be re-aggregable (counts /
    integer sums; avg is derivable as sum/count downstream).

    Output: one row per (granularity, bucket, *keys) across all levels.
    """
    sum_col = sum_col if sum_col is not None else F.lit(0).cast("long")
    fine = (
        df.groupBy(F.date_trunc(levels[0], F.col(ts_col)).alias("bucket"), *keys)
        .agg(
            F.count(F.lit(1)).alias(count_alias),
            F.sum(sum_col).alias(sum_alias),
        )
        .withColumn("granularity", F.lit(levels[0]))
    )
    out, prev = fine, fine
    for lvl in levels[1:]:
        prev = (
            prev.groupBy(F.date_trunc(lvl, F.col("bucket")).alias("bucket"), *keys)
            .agg(
                F.sum(count_alias).alias(count_alias),
                F.sum(sum_alias).alias(sum_alias),
            )
            .withColumn("granularity", F.lit(lvl))
        )
        out = out.unionByName(prev)
    return out.select("granularity", "bucket", *keys, count_alias, sum_alias)


def sessionize_lag_sweep(
    df: DataFrame,
    ts_col: str,
    gap_ms: int,
    keys: list[str],
) -> DataFrame:
    """Gaps-and-islands sessionization: the input plus a per-key dense
    ``sid`` column (1-based), for pipelines that need the SESSION ID ON
    EVERY ROW — a keyed ``session_window`` aggregate can't give that
    (e.g. per-session type sets, conversion flags).

    Boundary contract (pinned by tests/test_boundaries.py): a new
    session starts only when the delta STRICTLY exceeds the gap —
    exact-gap touch merges, matching Spark's session_window and every
    session oracle in the registry. This helper is the single home of
    that rule for the lag-sweep form; round 4 caught two inline copies
    carrying an identical `>=` bug.

    Grain contract: the delta compares at MICROSECOND precision (the
    timestamps' native grain), like Spark's session_window and the
    registry's `ts - prev_ts > INTERVAL ...` oracles. An earlier
    unix_millis form floored both timestamps to ms first, silently
    merging an event that is 1 µs past the gap inside the same
    millisecond — organically unreachable (no two organic events of a
    user straddle a boundary millisecond; sweeps re-proven identical)
    but a latent flake at corpus density (r14 universe-fuzz find).

    One shuffle on the keys; the lag and running-sum windows share the
    same (keys, ts) sort.
    """
    from pyspark.sql import Window

    wo = Window.partitionBy(*keys).orderBy(ts_col)
    marked = df.withColumn(
        "_new_session",
        F.when(
            F.lag(ts_col).over(wo).isNull()
            | (
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.lag(ts_col).over(wo))
                > gap_ms * 1000
            ),
            1,
        ).otherwise(0),
    )
    return marked.withColumn(
        "sid",
        F.sum("_new_session").over(
            wo.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).drop("_new_session")
