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


def kmv_distinct(
    df: DataFrame, group_keys: list[str], col: str, k: int = 32
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group — a mergeable
    sketch with a DETERMINISTIC, oracle-replicable construction (portable
    md5-based hash, llm/hashing.py): keep the k smallest distinct hash
    values; estimate = (k-1) · P / kth_smallest, exact count when fewer
    than k distinct hashes exist.

    Why a sketch when Spark has approx_count_distinct: HLL registers are
    engine-internal (not checkable against another engine, not readable
    downstream); KMV retained sets are plain integers — mergeable across
    groups/windows by unioning retained sets and re-taking the k smallest
    (see merge test), which is what a rollup over sketches needs.

    Plan shape: distinct on (group, hash) → per-group k-smallest via a
    row_number window (one shuffle on the group key). At 100 TB the
    per-partition partial (each partition keeps its own k smallest, merge
    unions) replaces the window with a custom TypedImperativeAggregate /
    pandas UDAF; the retained-set semantics and estimator stay identical.
    """
    from streambench_spark.llm.hashing import MERSENNE_P, spark_hash32

    from pyspark.sql import Window

    h = spark_hash32(f"CAST({col} AS STRING)")
    hashed = df.select(
        *group_keys, F.expr(f"{h} % {MERSENNE_P}L").alias("_h")
    ).distinct()
    w = Window.partitionBy(*group_keys).orderBy("_h")
    topk = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return (
        topk.groupBy(*group_keys)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("_h").alias("_kth"))
        .select(
            *group_keys,
            "n_kept",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(
                F.round(
                    F.lit(float(k - 1)) * F.lit(float(MERSENNE_P)) / F.col("_kth"), 6
                )
            )
            .alias("estimate"),
        )
    )


def kmv_retained(
    df: DataFrame, group_keys: list[str], col: str, k: int = 32
) -> DataFrame:
    """The KMV sketch ITSELF: per group, the k smallest distinct portable
    hashes of ``col`` as plain (group..., _h) rows. This is the mergeable
    representation — union retained frames from any partitioning of the
    data (days, shards, engines) and re-take the k smallest per group to
    get the sketch of the union, exactly (no approximation is introduced
    by merging). ``kmv_distinct`` = estimator over this frame."""
    from pyspark.sql import Window

    from streambench_spark.llm.hashing import MERSENNE_P, spark_hash32

    h = spark_hash32(f"CAST({col} AS STRING)")
    hashed = df.select(
        *group_keys, F.expr(f"{h} % {MERSENNE_P}L").alias("_h")
    ).distinct()
    w = Window.partitionBy(*group_keys).orderBy("_h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(
    retained: DataFrame, group_keys: list[str], k: int = 32
) -> DataFrame:
    """(group..., n_kept, estimate) from a retained-hash frame: exact
    count below k, else the (k-1)*P/kth_smallest estimator."""
    from streambench_spark.llm.hashing import MERSENNE_P

    return (
        retained.groupBy(*group_keys)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("_h").alias("_kth"))
        .select(
            *group_keys,
            "n_kept",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(
                F.round(
                    F.lit(float(k - 1)) * F.lit(float(MERSENNE_P)) / F.col("_kth"), 6
                )
            )
            .alias("estimate"),
        )
    )
