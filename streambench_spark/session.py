"""SparkSession factory — the engine's equivalent of the reference's
``SparkHelper.getAndConfigureSparkSession`` (ysb/benchmark/spark/
SparkHelper.scala:6-27), with defaults tuned for scale rather than the
reference's single-partition benchmark mode.

Scale posture: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), broadcast threshold explicit, shuffle partitions sized to the
cluster (here: local[N] test mode). On a 1000-executor cluster the same
session factory is used with ``shuffle_partitions`` set to 2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# set-but-empty env var = unset (int('') would crash at import time)
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS") or "32")


def get_spark(
    app_name: str = "streambench-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine session.

    The reference forces ``spark.sql.shuffle.partitions = 1``
    (SparkYahooRunner.scala:69) because it benchmarks a single core; we
    default to the core count and rely on AQE to coalesce — the setting is
    still exposed as a knob for parity with the reference's
    ``sparkParallelism``.
    """
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Lower the post-shuffle coalescing FLOOR (default 1MB) so
        # parallelismFirst's total/parallelism target actually applies to
        # byte-light CPU-DENSE stages (array_intersect over adjacency
        # arrays, shingle set verify, regex tokenize): at the default, a
        # 5 MB shuffle feeding 13 CPU-seconds of work coalesces to 5
        # tasks and serializes on a 32-core node (r15 measured:
        # copurchase_triangles 7.2 -> 4.5 s, neardup_ngram_jaccard_capped
        # 3.0 -> 1.8 s). Scale-inert by construction: coalescing can
        # never EXCEED shuffle.partitions, and at production volumes
        # total/parallelism dwarfs any floor so the knob never engages —
        # it only stops tiny-byte stages from losing the parallelism the
        # cluster already has. Env-overridable for per-deployment tuning.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64KB"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no ns
        # timestamp type — read as long and convert in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.shuffle.spill.compress", "true")
        # Pin the JVM default locale: Spark's plain lower()/upper() read
        # it on the non-ASCII slow path (Turkish-I class — see
        # llm/hashing.locale_free_lower_sql, which fixes the plans
        # themselves). The pin is defense-in-depth for any remaining
        # locale-reading JVM code path; it cannot retro-apply to a
        # session some other code already launched (static conf), which
        # is exactly why the plan-level fix is the primary one.
        .config("spark.driver.extraJavaOptions",
                "-Duser.language=en -Duser.country=US")
        .config("spark.executor.extraJavaOptions",
                "-Duser.language=en -Duser.country=US")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate() silently ignores .config() when a session already exists
    # in the JVM — re-apply every runtime-settable conf the caller relies
    # on (correctness confs always; shuffle partitions and extra_conf when
    # explicitly requested) so they take effect regardless of who created
    # the session first.
    reapply = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize":
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64KB"),
    }
    if shuffle_partitions is not None:
        reapply["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    reapply.update(extra_conf or {})
    for k, v in reapply.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a pre-existing session: not settable
    return spark
