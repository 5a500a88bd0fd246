"""Universe fuzz: every oracle-checkable registry query over complete
10-table ADVERSARIAL fixture dirs ("universes"), each stressing one
degenerate axis across all tables at once:

  ties_one       every timestamp tied / single-row tables / one vector
  zeros          all-zero values, prices, balances and vectors; empty
                 supplier; punctuation-only docs
  dups           duplicate ids, docs and vectors; broken FKs; hot keys
  organic_small  small hand-written sane rows (incl. µs jitter on ts)

This is the round-14 closure complement to tests/test_fixture_fuzz.py:
the per-family hypothesis suites go deep on one table's shapes; this
script goes WIDE — all ~216 queries x 4 universes in one pass — so no
registry query is ever again a never-fuzzed surface. First run found:
the dynamic-gap session µs/ms grain split, the lag-sweep ms floor, the
interval-trigger drain's reliance on mis-attributed numInputRows, and
the F.round shortest-repr half-boundary in embedding_norm_stats (each
fixed + pinned in test_fixture_fuzz.py::test_r14_universe_regressions).

Advisory audit (run at round close, like invariance_probe):

    python scripts/universe_fuzz.py            # all queries, 4 universes
    python scripts/universe_fuzz.py zeros q1 q2  # one universe, subset

Exit code 1 on any crash or oracle mismatch.
"""

from __future__ import annotations

import datetime
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UNIVERSES = ["ties_one", "zeros", "dups", "organic_small", "extreme_values"]

# no data input (closed-form generators) => shape-independent, skipped
EXCLUDE = {
    "generator_events",
    "generator_events_flink",
    # The streaming OUTER interval joins mismatch tiny fixtures BY
    # CONTRACT (same exclusion as the r13 hypothesis fuzz): their
    # documented `ts < 2024-01-29` horizon clip presumes the frozen
    # table's Jan-30 horizon, and outer-row flush on a bounded drain
    # depends on whether a trailing no-data micro-batch advances the
    # watermark past the band — nondeterministic on arbitrary fixture
    # horizons, pinned instead by their sf-dir driver proofs (r13) and
    # the inner-join universe rows here.
    "interval_join_left_outer_streaming",
    "interval_join_full_outer_streaming",
}

BASE = 1_700_000_000
D0 = datetime.datetime(1995, 1, 1)
def day(off): return D0 + datetime.timedelta(days=off)

def _w(tmp, name, cols):
    pq.write_table(pa.table(cols), os.path.join(tmp, f"{name}.parquet"))

def write_universe(tmp, kind):
    # ---- events ----
    if kind == "ties_one":
        ev = [(i, BASE, 0, 0, "view", 5.0) for i in range(6)]
    elif kind == "zeros":
        ev = [(i, BASE + i * 1800, 0, i % 3,
               ["view", "click", "cart", "purchase"][i % 4], 0.0)
              for i in range(10)]
    elif kind == "dups":
        ev = [(i % 3, BASE + (i % 2) * 7, i % 2, i % 2, "view", 2.5)
              for i in range(8)]
    elif kind == "extreme_values":
        # r15 (deferred from the r14 triage): values AT the
        # validate_events domain cap (1000.00 = 100k cents, past the
        # c⁴-in-BIGINT bound), one cent under, just past the bound,
        # and the low edge — with µs-boundary jitter (0 / 999999 / 1 /
        # 500000) so cap values also cross ms/s truncation seams.
        ev = [(i, BASE + i * 7000, i % 3, [0, 999_999, 1, 500_000][i % 4],
               ["view", "click", "cart", "purchase"][i % 4],
               [1000.0, 999.99, 551.09, 0.01][i % 4])
              for i in range(16)]
    else:  # organic_small
        ev = [(i, BASE + i * 9431, i % 4,  i % 3,
               ["view", "click", "cart", "purchase", "signup"][i % 5],
               round(i * 13.37 % 520, 2))
              for i in range(24)]
    _w(tmp, "events", {
        "event_id": pa.array([r[0] for r in ev], pa.int64()),
        "ts": pa.array([(r[1]) * 1_000_000 + r[3] for r in ev], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in ev], pa.int64()),
        "event_type": pa.array([r[4] for r in ev], pa.string()),
        "value": pa.array([r[5] for r in ev], pa.float64()),
        "props": pa.array(['{}'] * len(ev), pa.string()),
    })
    # ---- documents ----
    if kind == "ties_one":
        docs = [(0, "x", "en", "web", 1)]
    elif kind == "zeros":
        docs = [(0, "....", "en", "web", 4), (1, "####", "fr", "book", 4)]
    elif kind == "dups":
        docs = [(i, "the data spark the data spark", "en", "web", 29)
                for i in range(4)]
    elif kind == "extreme_values":
        # length + byte-width extremes: a ~400-char single-token run, a
        # 1-char doc, 4-byte (emoji) and 3-byte (CJK) UTF-8, a combining
        # accent, and PII-shaped text — the byte-vs-codepoint and
        # length-normalization seams.
        docs = [
            (0, ("spark " * 67).strip(), "en", "web", 0),
            (1, "x", "en", "book", 0),
            (2, "café 中文分析 \U0001f600\U0001f680 data", "xx", "web", 0),
            (3, "café naivë résumé", "fr", "book", 0),
            (4, "mail me at a@b.co or call 555-123-4567 now", "en", "web", 0),
            (5, "the of data spark zebra", "en", "book", 0),
        ]
    else:
        words = ["the", "of", "data", "spark", "email", "zebra", "café", "qq"]
        docs = [(i, " ".join(words[(i + j) % 8] for j in range(3 + i % 9)),
                 ["en", "fr", "xx"][i % 3], ["web", "book"][i % 2], 20)
                for i in range(8)]
    _w(tmp, "documents", {
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    })
    # ---- embeddings ----
    DIM = 64
    if kind == "ties_one":
        vecs, labels = [[0.5] * DIM], [0]
    elif kind == "zeros":
        vecs, labels = [[0.0] * DIM] * 3, [0, 1, 2]
    elif kind == "dups":
        vecs, labels = [[0.25] * DIM] * 4, [0] * 4
    elif kind == "extreme_values":
        # magnitude extremes at the DECIMAL(28,12)-ledger domain edges
        # the covariance/PCA docstrings claim (|x| ≤ ~1e3 keeps 12dp
        # products + corpus sums inside 10^16 integer headroom —
        # anything bigger crashes BOTH engines in parity, which a
        # crash-reporting fuzz can't distinguish from a defect):
        # ±1000 caps, the float32 denormal edge (12dp-rounds to 0),
        # values whose pairwise products land ON the 5e-13 half-boundary
        # of the shared floor(x*1e12+0.5) rounding, and sign mixes.
        vecs = [
            [1000.0] * DIM,
            [-1000.0] * DIM,
            [1.0e-38] * DIM,
            [7.0710678e-7] * DIM,
            [(-1.0) ** j * 1000.0 if j % 2 else 0.001 for j in range(DIM)],
            [((j * 11) % 2001 - 1000) / 1000.0 for j in range(DIM)],
        ]
        labels = [0, 1, 2, 0, 1, 2]
    else:
        vecs = [[((i * 37 + j * 11) % 2001 - 1000) / 1000.0 for j in range(DIM)]
                for i in range(10)]
        labels = [i % 4 for i in range(10)]
    _w(tmp, "embeddings", {
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    # ---- TPC-H ----
    if kind == "ties_one":
        li = [(0, 0, 0, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", day(987))]
        orders = [(0, 0, "F", 0.0, day(152), "1-URGENT")]
        cust = [(0, "Customer#0", 1, 100.0, "BUILDING")]
        supp = [(0, "Supplier#0", 5, 0.0)]
        part = [(0, "small bolt", "Brand#12", "ECONOMY", 25, 1.0)]
    elif kind == "zeros":
        li = [(i % 2, i % 2, 0, i + 1, 5.0, 0.0, 0.0, 0.0, "N", "O", day(987))
              for i in range(4)]
        orders = [(0, 0, "F", 0.0, day(152), "1-URGENT"),
                  (1, 0, "O", 0.0, day(400), "5-LOW")]
        cust = [(0, "Customer#0", 1, 0.0, "BUILDING")]
        supp = []
        part = [(0, "small bolt", "Brand#12", "ECONOMY", 25, 0.0),
                (1, "large rod", "Brand#13", "PROMO", 10, 0.0)]
    elif kind == "dups":
        li = [(0, 0, 0, 1 + i % 2, 3.0, 50.0, 0.05, 0.02, "R", "F", day(500))
              for i in range(6)]
        orders = [(0, 9, "F", 150.0, day(500), "2-HIGH")]  # broken FK custkey
        cust = [(0, "Customer#0", 3, -10.0, "AUTOMOBILE"),
                (1, "Customer#1", 3, -10.0, "AUTOMOBILE")]
        supp = [(0, "Supplier#0", 2, 5.0)]
        part = [(0, "large bolt", "Brand#45", "STANDARD", 30, 9.99)]
    elif kind == "extreme_values":
        # price at the 10^10-cent edge (a cents² anywhere would pass
        # BIGINT), quantity at the 50 cap, discount spanning 0 → 1.0
        # (type-valid past the 0.10 spec cap; revenue collapses to 0),
        # dates at the 1992/1998 domain edges, negative balances.
        li = [(i % 3, i % 3, i % 2, 1 + i % 4,
               [50.0, 1.0, 49.0, 25.0][i % 4],
               [99_999_999.99, 0.01, 950_000.5, 123.45][i % 4],
               [0.0, 0.10, 0.5, 1.0][i % 4],
               [0.08, 0.0, 0.04, 0.08][i % 4],
               "ANR"[i % 3], "OF"[i % 2],
               day([-1095, 1460, 0, 730][i % 4]))
              for i in range(12)]
        orders = [(0, 0, "F", 99_999_999.99, day(-1095), "1-URGENT"),
                  (1, 1, "O", 0.01, day(1460), "5-LOW"),
                  (2, 0, "P", 5_000_000.0, day(730), "3-MEDIUM")]
        cust = [(0, "Customer#0", 0, -999.99, "BUILDING"),
                (1, "Customer#1", 24, 9_999.99, "AUTOMOBILE")]
        supp = [(0, "Supplier#0", 0, -999.99),
                (1, "Supplier#1", 24, 9_999.99)]
        part = [(0, "small bolt", "Brand#12", "ECONOMY", 1, 0.01),
                (1, "large promo rod", "Brand#45", "PROMO", 50,
                 99_999.99),
                (2, "cold widget", "Brand#13", "STANDARD", 25, 901.0)]
    else:
        li = [(i % 5, i % 4, i % 3, 1 + i % 7, float(1 + i % 50),
               round(100.0 + i * 321.07 % 9000, 2), (i % 11) / 100.0,
               (i % 9) / 100.0, "ANR"[i % 3], "OF"[i % 2], day((i * 97) % 2500))
              for i in range(20)]
        orders = [(k, k % 4, "POF"[k % 3], round(1000.0 + k * 77.7, 2),
                   day((k * 313) % 2400),
                   ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                    "5-LOW"][k % 5]) for k in range(5)]
        cust = [(k, f"Customer#{k}", (k * 7) % 25,
                 round(-500.0 + k * 333.3, 2),
                 ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
                  "FURNITURE"][k % 5]) for k in range(4)]
        supp = [(k, f"Supplier#{k}", (k * 5) % 25, round(k * 11.1, 2))
                for k in range(3)]
        part = [(k, ["small bolt", "small widget", "large bolt", "cold widget",
                     "blue rod"][k % 5],
                 ["Brand#12", "Brand#13", "Brand#14", "Brand#45"][k % 4],
                 ["ECONOMY", "PROMO", "STANDARD", "SMALL", "MEDIUM",
                  "LARGE"][k % 6], 1 + (k * 13) % 50, round(k * 7.77, 2))
                for k in range(4)]
    _w(tmp, "lineitem", {
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_partkey": pa.array([r[1] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in li], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in li], pa.int32()),
        "l_quantity": pa.array([r[4] for r in li], pa.float64()),
        "l_extendedprice": pa.array([r[5] for r in li], pa.float64()),
        "l_discount": pa.array([r[6] for r in li], pa.float64()),
        "l_tax": pa.array([r[7] for r in li], pa.float64()),
        "l_returnflag": pa.array([r[8] for r in li], pa.string()),
        "l_linestatus": pa.array([r[9] for r in li], pa.string()),
        "l_shipdate": pa.array([r[10] for r in li], pa.timestamp("us")),
    })
    _w(tmp, "orders", {
        "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
        "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
        "o_orderstatus": pa.array([r[2] for r in orders], pa.string()),
        "o_totalprice": pa.array([r[3] for r in orders], pa.float64()),
        "o_orderdate": pa.array([r[4] for r in orders], pa.timestamp("us")),
        "o_orderpriority": pa.array([r[5] for r in orders], pa.string()),
    })
    _w(tmp, "customer", {
        "c_custkey": pa.array([r[0] for r in cust], pa.int64()),
        "c_name": pa.array([r[1] for r in cust], pa.string()),
        "c_nationkey": pa.array([r[2] for r in cust], pa.int32()),
        "c_acctbal": pa.array([r[3] for r in cust], pa.float64()),
        "c_mktsegment": pa.array([r[4] for r in cust], pa.string()),
    })
    _w(tmp, "supplier", {
        "s_suppkey": pa.array([r[0] for r in supp], pa.int64()),
        "s_name": pa.array([r[1] for r in supp], pa.string()),
        "s_nationkey": pa.array([r[2] for r in supp], pa.int32()),
        "s_acctbal": pa.array([r[3] for r in supp], pa.float64()),
    })
    _w(tmp, "part", {
        "p_partkey": pa.array([r[0] for r in part], pa.int64()),
        "p_name": pa.array([r[1] for r in part], pa.string()),
        "p_brand": pa.array([r[2] for r in part], pa.string()),
        "p_type": pa.array([r[3] for r in part], pa.string()),
        "p_size": pa.array([r[4] for r in part], pa.int32()),
        "p_retailprice": pa.array([r[5] for r in part], pa.float64()),
    })
    _w(tmp, "nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    })
    _w(tmp, "region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"], pa.string()),
    })


def main() -> int:
    import shutil
    import tempfile
    import time

    import duckdb

    from scripts.oracle_check import normalize
    import __spark_entry__ as E
    from streambench_spark.session import get_spark
    from streambench_spark.schemas import TESTDATA_TABLES

    args = sys.argv[1:]
    kinds = [args.pop(0)] if args and args[0] in UNIVERSES else UNIVERSES
    only = set(args)

    spark = get_spark(app_name="universe-fuzz", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = E.queries(), E.oracle_sql()
    # A typo'd name argument must fail fast, not silently shrink coverage
    # to a false-green audit (same contract as oracle_check.py).
    unknown = sorted(only - set(qs))
    if unknown:
        print(f"unknown query names: {unknown}", file=sys.stderr)
        sys.exit(2)
    names = [n for n in qs if n not in EXCLUDE and (not only or n in only)]
    print(f"universes: {kinds}  queries: {len(names)}")
    failures, timings = [], []
    for kind in kinds:
        tmp = tempfile.mkdtemp(prefix=f"universe_{kind}_")
        write_universe(tmp, kind)
        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet'")
        for name in names:
            t0 = time.time()
            try:
                df = qs[name](spark, tmp)
                got = normalize([tuple(r) for r in df.collect()], df.columns)
            except Exception as e:  # noqa: BLE001 — audit reports, never aborts
                failures.append((kind, name, "SPARK_CRASH",
                                 str(e).splitlines()[0][:150]))
                print(f"  FAIL {kind}/{name} SPARK_CRASH")
                continue
            sql = oracles.get(name)
            if sql is None:
                continue
            try:
                rel = con.sql(sql)
                want = normalize(
                    [tuple(r) for r in rel.fetchall()], list(rel.columns)
                )
            except Exception as e:  # noqa: BLE001
                failures.append((kind, name, "ORACLE_CRASH",
                                 str(e).splitlines()[0][:150]))
                print(f"  FAIL {kind}/{name} ORACLE_CRASH")
                continue
            if got != want:
                failures.append((kind, name, "MISMATCH",
                                 f"{got[:2]} vs {want[:2]}"))
                print(f"  FAIL {kind}/{name} MISMATCH")
            timings.append((time.time() - t0, f"{kind}/{name}"))
        con.close()
        shutil.rmtree(tmp, ignore_errors=True)
        print(f"universe {kind}: done")
    timings.sort(reverse=True)
    print("slowest:", [(round(s, 1), n) for s, n in timings[:8]])
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for f in failures:
            print("  ", *f)
        return 1
    print(f"\nALL GREEN: {len(names)} queries x {len(kinds)} universes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
