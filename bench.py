"""Benchmark entry point (driver contract).

Runs the registry's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a ``noop``-format write — full
execution on the executors, zero driver-side collect, which is the shape a
100 TB run has (results land in a sink, not the driver).

The richer harness (trial loop M4, param registry M5, throughput/latency
metric tuple M1-M3 per ysb/benchmark/yahoo/Benchmark.scala:59-126) lives in
``streambench_spark/bench/``; this file is the driver-facing one-line shim.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from streambench_spark.session import get_spark

    spark = get_spark(app_name="streambench-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from streambench_spark.plans.queries import REGISTRY

    # Warm the JVM + parquet footers + Python/Arrow workers once so
    # per-query timings measure the query, not session start or the
    # one-time worker spawn (the reference similarly ramps up 10 s,
    # StreamBenchMain.scala:33).
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()

    def _noop_batch(batches):
        yield from batches

    spark.range(0, 64, 1, cpus).mapInPandas(
        _noop_batch, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, qdef in REGISTRY.items():
        t0 = time.perf_counter()
        try:
            df = qdef.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the one-line contract even on error
            timings[name] = -1.0
            print(f"bench error in {name}: {exc!r}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(json.dumps({
        "metric": "registry_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
