"""Close-gate: extreme-value probe at the events value-domain cap.

Round-14's post-close audit, institutionalized (VERDICT r14 item 3):
the `validate_events` contract caps `value` at 1000.00 (100,000 cents),
far past the organic per-SF maxima (327 at sf0.001 → 560 at sf0.1) and
past the ~55,108-cent bound where c⁴ of a single cent value would
overflow BIGINT. Every value-domain query that accumulates power sums
(moments, correlation, drift stats) claims DECIMAL-ledger headroom up
to that cap in its docstring; this probe proves the claim by running
all of them on a fixture whose values sit AT the cap (1000.00), one
ulp under it (999.99), just past the c⁴-in-BIGINT bound (551.09), and
at the low edge (0.01), each against its DuckDB oracle.

The fixture is deterministic (no RNG) so the probe is a stable gate:
`tests/test_extreme_values.py` pins the identical fixture + query set
into the default pytest run.

Usage: python scripts/extreme_value_probe.py [query ...]
Exit 0 = all green; 1 = mismatch/crash; 2 = unknown query name.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BASE = 1_700_000_000

# Domain-cap value cycle: the cap, one cent under, just past the
# c⁴-in-BIGINT bound, and the low edge.
CAP_VALUES = [1000.0, 999.99, 551.09, 0.01]

# The value-domain query set: every registry query whose plan folds
# events.value through power-sum / rank / bucket accumulators where an
# integer ledger could overflow or lose exactness at the domain cap.
VALUE_DOMAIN_QUERIES = [
    "moments_by_type",
    "value_correlation",
    "value_autocorr",
    "global_percentiles",
    "grouped_percentiles",
    "benford_digit_test",
    "activity_gini",
    "mad_by_type",
    "equidepth_histogram",
    "histogram_sketch_quantiles",
    "value_histogram",
    "daily_value_bands",
    "hourly_anomalies",
    "segment_linear_trend",
    "twap_value_per_user",
    "revenue_pareto",
    "revenue_share_by_type",
    "ewma_hourly_value",
    "weekly_revenue_growth",
    "psi_value_drift",
    "ks_value_drift",
    "mannwhitney_value_drift",
    "zorder_layout_keys",
    "ip_pack_pairs",
]


def write_cap_fixture(tmp: str, n: int = 30) -> None:
    """Deterministic 30-row events table with values on the cap cycle."""
    pq.write_table(
        pa.table({
            "event_id": pa.array(list(range(n)), pa.int64()),
            "ts": pa.array(
                [(BASE + i * 7000) * 1_000_000 for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(
                [["view", "click", "cart", "purchase"][i % 4] for i in range(n)],
                pa.string(),
            ),
            "value": pa.array(
                [CAP_VALUES[i % 4] for i in range(n)], pa.float64()
            ),
            "props": pa.array(["{}"] * n, pa.string()),
        }),
        os.path.join(tmp, "events.parquet"),
    )


def run_probe(spark, names: list[str]) -> list[tuple[str, str, str]]:
    """Run each query vs its oracle on the cap fixture; return failures."""
    import duckdb

    from scripts.oracle_check import normalize

    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    unknown = sorted(set(names) - set(qs))
    if unknown:
        raise KeyError(f"unknown query names: {unknown}")

    tmp = tempfile.mkdtemp(prefix="extreme_")
    failures: list[tuple[str, str, str]] = []
    try:
        write_cap_fixture(tmp)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'"
        )
        for name in names:
            try:
                df = qs[name](spark, tmp)
                got = normalize([tuple(r) for r in df.collect()], df.columns)
            except Exception as e:  # noqa: BLE001 — audit reports, never aborts
                failures.append((name, "SPARK_CRASH",
                                 str(e).splitlines()[0][:150]))
                continue
            try:
                rel = con.sql(oracles[name])
                want = normalize(
                    [tuple(r) for r in rel.fetchall()], list(rel.columns)
                )
            except Exception as e:  # noqa: BLE001
                failures.append((name, "ORACLE_CRASH",
                                 str(e).splitlines()[0][:150]))
                continue
            if got != want:
                failures.append(
                    (name, "MISMATCH", f"{got[:2]!r} vs {want[:2]!r}")
                )
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return failures


def main() -> None:
    from streambench_spark.session import get_spark

    names = sys.argv[1:] or VALUE_DOMAIN_QUERIES
    spark = get_spark(app_name="extreme-value-probe", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        failures = run_probe(spark, names)
    except KeyError as e:
        print(e, file=sys.stderr)
        sys.exit(2)
    for name, kind, detail in failures:
        print(f"FAIL {name} {kind} {detail}")
    print(f"extreme-value probe: {len(names) - len(failures)}/{len(names)} "
          f"green at the 100,000-cent domain cap")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
