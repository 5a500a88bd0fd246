"""Command-line frontend: the engine as a product, not just a library.

    python -m streambench_spark list [--tag TAG]
    python -m streambench_spark run QUERY [--sf-dir DIR] [--limit N]
    python -m streambench_spark explain QUERY [--sf-dir DIR]
    python -m streambench_spark oracle QUERY

The reference drives everything through per-engine benchmark mains
(ysb/StreamBenchMain.scala, streambox run scripts); here one CLI fronts
the whole registry. `run` prints the result (driver-side show — use
--limit to bound it), `explain` prints the formatted physical plan
(the PLANS.md view of a single query), `oracle` prints the DuckDB
oracle SQL so any engine can cross-check a result.
"""

from __future__ import annotations

import argparse
import sys

from streambench_spark.catalog import DEFAULT_SF_DIR


def _registry():
    from streambench_spark.plans.queries import REGISTRY

    return REGISTRY


def _spark():
    from streambench_spark.session import get_spark

    spark = get_spark(app_name="streambench-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_list(args: argparse.Namespace) -> int:
    reg = _registry()
    for name, qd in sorted(reg.items()):
        if args.tag and args.tag not in qd.tags:
            continue
        tags = ",".join(qd.tags)
        oracle = "oracle" if qd.oracle else "rows-only"
        print(f"{name:40s} [{tags}] ({oracle})")
    return 0


def _resolve(name: str):
    reg = _registry()
    if name not in reg:
        matches = sorted(n for n in reg if name in n)
        hint = f"; close matches: {', '.join(matches[:5])}" if matches else ""
        print(f"unknown query {name!r}{hint}", file=sys.stderr)
        raise SystemExit(2)
    return reg[name]


def cmd_run(args: argparse.Namespace) -> int:
    qd = _resolve(args.query)
    df = qd.fn(_spark(), args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    # public API (no private-JVM reach-through); note the CLI session
    # runs at the full core count, so partition counts in this output
    # can differ from PLANS.md, which dump_plans generates at 8
    qd = _resolve(args.query)
    df = qd.fn(_spark(), args.sf_dir)
    df.explain(mode="formatted")
    return 0


def cmd_oracle(args: argparse.Namespace) -> int:
    qd = _resolve(args.query)
    if qd.oracle is None:
        print("-- no SQL oracle (rows-only check)", file=sys.stderr)
        return 1
    print(qd.oracle.strip())
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m streambench_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries")
    p_list.add_argument("--tag", help="filter by tag")
    p_list.set_defaults(fn=cmd_list)

    p_run = sub.add_parser("run", help="execute a query and show the result")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_run.add_argument("--limit", type=int, default=20)
    p_run.set_defaults(fn=cmd_run)

    p_explain = sub.add_parser("explain", help="print the physical plan")
    p_explain.add_argument("query")
    p_explain.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_explain.set_defaults(fn=cmd_explain)

    p_oracle = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    p_oracle.add_argument("query")
    p_oracle.set_defaults(fn=cmd_oracle)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
