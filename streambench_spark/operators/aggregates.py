"""Non-windowed aggregations from SURVEY.md §2.4.

- A7 batch grouped max            SparkYahooRunner.scala:136-137
- A8 global multi-agg + percentiles SparkYahooRunner.scala:139-144
- A9 throughput counting is in streaming/listeners.py

``percentile`` (exact) is used instead of ``percentile_approx`` when an
oracle must hash-match (DuckDB quantile_cont is exact); the harness keeps
``percentile_approx`` for the reference-faithful latency metric where
approximation is the documented semantic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """A7 generalization: hash aggregate with map-side partials."""
    return df.groupBy(*keys).agg(*aggs)


def salted_grouped_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant two-phase aggregate: group by (keys, salt) first —
    spreading a hot key over ``salt_buckets`` reducers — then re-aggregate
    the partials by the true keys.

    Semantically identical to a plain groupBy for any decomposable
    aggregate (sum/count/min/max: pass the partial as ``partial_aggs``
    and its combiner as ``final_aggs`` over the partial's column name).
    Catalyst's map-side partial aggregation already handles *moderate*
    skew; explicit salting is for the pathological case where one key's
    partials alone overwhelm a single reducer — the standard 100 TB
    mitigation alongside AQE's skew-join splitting (which only covers
    joins, not aggregations).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(),
                        F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def global_percentiles(
    df: DataFrame, col: str, exact: bool = False
) -> DataFrame:
    """A8: min/mean/p95/p99/max over a numeric column, one result row.

    The reference computes this over latency diffs with percentile_approx
    (SparkYahooRunner.scala:139-144). Exact mode mirrors DuckDB
    quantile_cont for oracle checks.
    """
    c = F.col(col)
    if exact:
        p95 = F.expr(f"percentile({col}, 0.95)")
        p99 = F.expr(f"percentile({col}, 0.99)")
    else:
        p95 = F.percentile_approx(c, 0.95)
        p99 = F.percentile_approx(c, 0.99)
    return df.agg(
        F.min(c).alias("min_v"),
        F.avg(c).alias("avg_v"),
        p95.alias("p95_v"),
        p99.alias("p99_v"),
        F.max(c).alias("max_v"),
    )
