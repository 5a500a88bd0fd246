"""Streaming state-bound probe: MEASURE the watermark-eviction contract
SCALE.md's "Streaming state bounds" section argues.

Two 30 s live windowed-aggregation runs over the same rate source
(5 s event-time windows, 100k distinct keys):

1. append mode + 1 s watermark — state should plateau at
   (windows in flight) x (keys per window): eviction working.
2. update mode, NO watermark (the reference Spark runner's shape,
   SparkYahooRunner.scala keeps unbounded state) — state should grow
   linearly with elapsed windows: the documented OOM hazard at scale.

Per-batch `stateOperators` metrics (numRowsTotal / numRowsUpdated /
removed) come from the query's recentProgress. Not part of the driver
contract; run manually:

    python scripts/state_bound_probe.py [duration_s]   # default 30

Prints one JSON object.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    duration_s = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    from pyspark.sql import functions as F

    from streambench_spark.session import get_spark
    from streambench_spark.streaming.ysb import start_query

    spark = get_spark(app_name="state-bound-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def keyed_stream():
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 2_000_000)
            .option("numPartitions", 32)
            .load()
            .select(
                F.col("timestamp").alias("ts"),
                (F.col("value") % 100_000).alias("key"),
            )
        )

    def windowed(src):
        return src.groupBy(F.window("ts", "5 seconds"), "key").agg(
            F.count(F.lit(1)).alias("n")
        )

    _ROCKSDB = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )

    def run(mode: str, watermark: str | None, rocksdb: bool = False) -> dict:
        src = keyed_stream()
        if watermark is not None:
            src = src.withWatermark("ts", watermark)
        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        if rocksdb:
            spark.conf.set(key, _ROCKSDB)
        try:
            q = start_query(windowed(src), fmt="noop", mode=mode,
                            trigger_interval_ms=1000)
        finally:
            if rocksdb:
                (spark.conf.set(key, prev) if prev
                 else spark.conf.unset(key))
        time.sleep(duration_s)
        # recentProgress items are StreamingQueryProgress objects in
        # pyspark 4 (dict-like via .json in older releases)
        progress = [
            p if isinstance(p, dict) else json.loads(p.json)
            for p in (q.recentProgress or [])
        ]
        q.stop()
        series = []
        for p in progress:
            ops = p.get("stateOperators") or []
            if not ops:
                continue
            series.append(
                {
                    "batch": p.get("batchId"),
                    "rows_total": ops[0].get("numRowsTotal"),
                    "rows_removed": ops[0].get("numRowsRemoved"),
                    "mem_bytes": ops[0].get("memoryUsedBytes"),
                }
            )
        totals = [s["rows_total"] for s in series if s["rows_total"] is not None]
        rates = [
            p.get("processedRowsPerSecond")
            for p in progress
            if p.get("processedRowsPerSecond")
        ]
        n = len(totals)
        return {
            "batches": n,
            "processed_rows_per_s_mean": (
                round(sum(rates) / len(rates), 1) if rates else None
            ),
            "state_rows_series": totals,
            "state_rows_max": max(totals) if totals else None,
            "state_rows_final": totals[-1] if totals else None,
            # linear-growth witness: compare the mean of the last third
            # to the mean of the middle third — a bounded run is flat
            "late_over_mid_ratio": (
                round(
                    (sum(totals[2 * n // 3:]) / max(1, n - 2 * n // 3))
                    / max(1.0, sum(totals[n // 3: 2 * n // 3]) / max(1, n // 3)),
                    3,
                )
                if n >= 6
                else None
            ),
            "rows_removed_total": sum(
                s["rows_removed"] or 0 for s in series
            ),
        }

    out = {
        "duration_s": duration_s,
        "keys": 100_000,
        "window": "5 seconds",
        "bounded_append_watermark_1s": run("append", "1 second"),
        "unbounded_update_no_watermark": run("update", None),
        # same bounded pipeline on the disk-backed store (the 100 TB
        # provider choice; result-identity is pinned by
        # tests/test_streaming.py — this records the local COST)
        "bounded_append_rocksdb": run("append", "1 second", rocksdb=True),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
