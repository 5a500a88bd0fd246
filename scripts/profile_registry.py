"""Per-query profile of the registry bench (optimization-round tooling).

For each registry query, separately times:
  - build_s: the Python-side ``fn(spark, sf_dir)`` call (plan construction,
    catalog loads, any driver-side actions the builder performs)
  - exec_s:  the noop-sink execution (the part that scales with data)
and records the number of Spark jobs the query submitted (job-group
counted), so fixed-overhead queries (many tiny jobs) separate from
data-bound ones. Same session/warmup shape as bench.py so the numbers
are comparable to BENCH_FULL entries.

Usage: python scripts/profile_registry.py [sf_dir] [out_json] [only...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_path = args[1] if len(args) > 1 else "/tmp/profile_registry.json"
    only = set(args[2:])

    from streambench_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or "32")
    spark = get_spark(app_name="streambench-profile", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()

    def _noop_batch(batches):
        yield from batches

    spark.range(0, 64, 1, cpus).mapInPandas(
        _noop_batch, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    def _noop_cogroup(left, right):
        return left

    from pyspark.sql import functions as F

    _w = spark.range(0, 64, 1, cpus).withColumn("k", F.col("id") % 8)
    _w.groupBy("k").cogroup(_w.groupBy("k")).applyInPandas(
        _noop_cogroup, schema="id long, k long"
    ).write.format("noop").mode("overwrite").save()

    from streambench_spark.plans.queries import REGISTRY

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name, qdef in REGISTRY.items():
        if only and name not in only:
            continue
        sc.setJobGroup(name, name)
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            df = qdef.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs = tracker.getJobIdsForGroup(name)
            out[name] = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "n_jobs": len(jobs),
            }
        except Exception as exc:
            out[name] = {"error": repr(exc)[:200]}
            print(f"profile error in {name}: {exc!r}", file=sys.stderr)
        finally:
            sc.setJobGroup("", "")
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    ok = {k: v for k, v in out.items() if "total_s" in v}
    total = sum(v["total_s"] for v in ok.values())
    build = sum(v["build_s"] for v in ok.values())
    print(json.dumps({
        "n": len(ok),
        "total_s": round(total, 1),
        "build_s": round(build, 1),
        "exec_s": round(total - build, 1),
        "out": out_path,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
