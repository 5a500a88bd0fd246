"""Dump .explain("formatted") for named registry queries into
plans/r16/<query>_<tag>.txt (optimization-round evidence artifacts).

Usage: python scripts/dump_r16_plans.py <tag> <query> [query ...]
       tag is e.g. "before" or "after".

Streaming-drain queries (whose builder executes the stream and returns a
batch frame over the sink files) are dumped as the plan of the RETURNED
frame plus a header noting the drain happens at build time — the
interesting plan for those lives in the streaming micro-batch, which
explain() cannot show; their evidence is the bench timing.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    from streambench_spark.session import get_spark

    spark = get_spark(app_name="streambench-plandump")
    spark.sparkContext.setLogLevel("ERROR")

    from streambench_spark.plans.queries import REGISTRY

    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        sys.exit(2)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({tag}) — explain('formatted') at {sf_dir}\n")
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
