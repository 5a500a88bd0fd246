"""Adjudicate the r14 one-artifact streaming-throughput dip (VERDICT r14
item 2): run the exact bench.py headline throughput suite (1 warmup + 3
measured 30 s trials at 28M rows/s requested, median reported) N times
back-to-back, recording the host gauge around each suite and the full
per-batch progress breakdown (addBatch / getBatch / walCommit /
queryPlanning ms) of every trial so a persistent dip is attributed, not
guessed at.

Usage: python scripts/throughput_adjudicate.py [n_suites] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _proc_stat():
    with open("/proc/stat") as fh:
        return list(map(int, fh.readline().split()[1:9]))


def _steal_pct(a, b):
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d)
    return round(100.0 * d[7] / tot, 2) if tot else 0.0


def main() -> None:
    n_suites = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/throughput_adjudicate.json"

    from streambench_spark.bench import BenchParams
    from streambench_spark.bench.harness import run_throughput_trial
    from streambench_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or "32")
    spark = get_spark(app_name="streambench-tput-adjudicate",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    params = BenchParams(duration_s=30, rows_per_second=28_000_000,
                         ramp_up_seconds=0, watermark="1 second",
                         num_partitions=cpus)

    suites = []
    for s in range(n_suites):
        stat0 = _proc_stat()
        runs = []
        for t in range(4):
            spark.sparkContext.setJobDescription(
                f"tput-adjudicate suite {s} trial {t}")
            r = run_throughput_trial(spark, params, source=None)
            runs.append(r)
        stat1 = _proc_stat()
        measured = sorted(runs[1:], key=lambda r: r["throughput_rows_per_s"])
        suite = {
            "suite": s,
            "steal_pct": _steal_pct(stat0, stat1),
            "trials_rows_per_s": [r["throughput_rows_per_s"] for r in runs],
            "median_rows_per_s": measured[1]["throughput_rows_per_s"],
            "trial_details": runs,
        }
        suites.append(suite)
        print(json.dumps({k: v for k, v in suite.items()
                          if k != "trial_details"}))
        with open(out_path, "w") as fh:
            json.dump(suites, fh, indent=1)
        time.sleep(2)

    # one instrumented trial: same pipeline/params, but keep the query
    # handle so recentProgress attributes batch time (addBatch / getBatch
    # / walCommit / queryPlanning) — the profile VERDICT r14 item 2 asks
    # for if the dip persists on a clean gauge
    from streambench_spark.bench.harness import _ysb_stream
    from streambench_spark.streaming.ysb import start_query

    sdf = _ysb_stream(spark, params)
    q = start_query(sdf, fmt="noop", mode="update", available_now=False,
                    trigger_interval_ms=params.trigger_interval_ms)
    time.sleep(params.duration_s)
    prog = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    q.awaitTermination(60)
    dur = []
    for p in prog:
        d = p.get("durationMs") or {}
        d["numInputRows"] = p.get("numInputRows")
        dur.append(d)
    result = {
        "suite_medians": [s["median_rows_per_s"] for s in suites],
        "median_of_medians": sorted(
            s["median_rows_per_s"] for s in suites)[n_suites // 2],
        "instrumented_batches": dur,
        "out": out_path,
    }
    suites.append({"instrumented": result})
    with open(out_path, "w") as fh:
        json.dump(suites, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "instrumented_batches"}))


if __name__ == "__main__":
    main()
