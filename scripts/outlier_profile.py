"""Multi-trial warm profile for registry queries flagged as bench outliers.

The registry bench (bench.py) times each query ONCE — that single shot
includes first-execution costs that vary with JIT state, GC phase, and
what ran before (r12 measured pca_top_component at 5.8 s cold vs a
3.0-3.2 s warm median in the same session). Cross-round single-shot
comparisons therefore carry ±40% per-query noise even on a healthy
host. When a round's two-artifact rule flags names as ">=1.5x vs a
prior round", THIS is the profiling step: 1 warmup + 7 measured trials
per name in one warmed session, reporting min and median, beside three
stable JVM-only controls that bound the session-level drift.

r12 usage that closed the r11 bandwidth watch item:
    python scripts/outlier_profile.py span_dedup tfidf_top_terms \
        pca_top_component training_mix_pipeline source_vocab_overlap \
        embedding_covariance contamination_scores kmeans_assign_step

Usage: python scripts/outlier_profile.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONTROLS = ["grouped_max", "tpch_q6_forecast_revenue", "filter_project"]
TRIALS = 7


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    if not args:
        print(__doc__)
        sys.exit(2)

    from streambench_spark.plans.queries import REGISTRY
    from streambench_spark.session import get_spark

    unknown = [n for n in args if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(
        app_name="outlier-profile", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm parquet footers + the Python/Arrow worker pool (bench.py does
    # the same) so trial 0 is the only cold sample.
    spark.read.parquet(os.path.join(sf, "events.parquet")).count()

    def _noop_batch(batches):
        yield from batches

    spark.range(0, 64, 1, 32).mapInPandas(
        _noop_batch, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict = {}
    for name in args + [c for c in CONTROLS if c in REGISTRY and c not in args]:
        fn = REGISTRY[name].fn
        ts = []
        for _ in range(TRIALS + 1):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        out[name] = {
            "warmup": round(ts[0], 3),
            "min": round(min(ts[1:]), 3),
            "median": round(statistics.median(ts[1:]), 3),
            "all": [round(x, 2) for x in ts[1:]],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
