"""One-off 1000x replicate-scale point (100M events from the sf0.1 base).

Extends the 8x/16x/64x trend recorded in SCALE.md with a point where the
events fact is ~30 GB-scale in memory terms (100M rows): run the ten
events-driven headline batch queries plus the YSB streaming drain over a
1000x-replicated events table, reusing bench.py's `_replicated_trial`
machinery verbatim so ratios are computed the same way the per-round
bench computes them (`ratio_per_copy` = time_at_kx / (k * time_at_1x)).

Not part of the driver contract; run manually:

    python scripts/replicate_1000x.py [copies]   # default 1000

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

import bench  # noqa: E402


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from streambench_spark.plans.queries import REGISTRY
    from streambench_spark.session import get_spark

    spark = get_spark(app_name="replicate-1000x")
    spark.sparkContext.setLogLevel("ERROR")

    # 1x base timings, same measurement the bench takes (noop sink)
    base: dict[str, float] = {}
    for name in bench.SCALED_BATCH:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        base[name] = round(time.perf_counter() - t0, 3)

    out = bench._replicated_trial(spark, sf_dir, copies, base)
    out["base_timings"] = base
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
