"""Benchmark harness: param registry (M5), trial loop (M4), and the
throughput/latency metric tuple (M1-M3) of the reference suite.

Reference shape: ysb/benchmark/yahoo/Benchmark.scala:12-17 (param map),
:59-126 (trial loop — run N trials, report each), and the metric tuple of
YahooBenchmark.scala:63-73 (throughput × latency min/avg/p95/p99/max).
"""

from streambench_spark.bench.params import BenchParams
from streambench_spark.bench.harness import (
    latency_report,
    run_benchmark,
    run_latency_trial,
    run_throughput_trial,
)

__all__ = [
    "BenchParams",
    "latency_report",
    "run_benchmark",
    "run_latency_trial",
    "run_throughput_trial",
]
