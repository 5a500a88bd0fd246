"""Plan-sensitivity probe: measure (don't assert) the three knobs the
SCALE.md posture leans on, at generator volume well above the shipped
testdata. Not part of the driver contract; run manually:

    python scripts/plan_sensitivity_probe.py [num_events]   # default 20M

Prints one JSON object. Each trial runs the same logical work end-to-end
into a noop sink; `reps` runs are taken and the MIN reported (the probe
asks "what does the plan cost", not "what does a cold JVM cost").

What it measures and why it matters at 100 TB:

1. join_strategy — THE YSB join (fact × small dim) with the production
   broadcast plan vs the same query with broadcast disabled (sort-merge/
   shuffled-hash: the fact side pays a full exchange). Local mode prices
   shuffle at memory speed (no network hop), so wall-clock alone cannot
   show the cluster cost — the probe therefore also records SHUFFLE
   WRITE BYTES per variant (UI REST API): the bytes a 1000-executor run
   would push over the network per job if the dim were NOT broadcast —
   the number behind SCALE.md's "the join never shuffles the fact side".

2. shuffle_partitions — a high-cardinality groupBy (per-user sum/count,
   ~100k groups) under shuffle.partitions ∈ {8, 32, 128, 512} with AQE
   coalescing ON (session default), plus 512 with AQE OFF. The posture
   claim: with AQE, over-provisioning is forgiving (coalesce eats the
   excess), under-provisioning is not (too-few partitions serialize
   reducers) — so size the knob high for the cluster, not per-query.

3. scan_split — a scan-bound windowed global sum under
   files.maxPartitionBytes ∈ {32m, 128m (default), 512m}: how much scan
   parallelism the split size buys on this file layout (testdata-scale
   files are footer-bound; at 100 TB the default 128m splits dominate
   and this knob is the lever for small-file vs giant-file layouts).

4. sketch_shuffle — the sketch-family scale contract, measured: exact
   per-key count vs the Count-Min build, and exact per-group distinct
   vs the KMV map-side-partial build, each at key cardinality 100k and
   2M over the same fact. Map-side partial aggregation bounds the EXACT
   agg's shuffle by (distinct keys per partition · partitions), so its
   exchange grows with cardinality until it degenerates to all-rows;
   the sketches shuffle a cardinality-INDEPENDENT frame (d·w cells per
   partition for CMS; k hashes per group per partition for KMV). The
   probe records shuffle-write bytes per variant — the number behind
   SCALE.md's "kilobytes at any corpus size".

5. bloom_decontaminate — the decontamination scale contract: filter the
   20M-row fact against a 1M-key banned set as (a) an exact anti-join
   with broadcast DISABLED (the 100 TB regime, where the exact banned
   set has outgrown the broadcast threshold: BOTH sides pay a full
   exchange) vs (b) the Bloom pre-filter (build = map-side-combined
   bit_or over ≤ m_words rows per partition; probe = one broadcast map
   column + row-local bit tests — ZERO fact-side exchange, plan-pinned
   in tests/test_plans.py and here measured in bytes). The Bloom path
   is the constant-cost pre-filter; the exact anti-join on the (tiny)
   survivor set restores exactness downstream.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _noop_time(df, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


_UI = "http://localhost:4050/api/v1"


def _shuffle_write_bytes() -> int | None:
    """Cumulative shuffle-write bytes across all stages so far (UI REST).

    Deltas around one run isolate a query's exchange volume — the
    cluster-scaling cost local-mode wall-clock cannot price.
    """
    import urllib.request

    try:
        with urllib.request.urlopen(f"{_UI}/applications", timeout=5) as r:
            app_id = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{_UI}/applications/{app_id}/stages?status=complete", timeout=5
        ) as r:
            return sum(s.get("shuffleWriteBytes", 0) for s in json.load(r))
    except Exception:
        return None


def _run_with_shuffle_bytes(df) -> int | None:
    before = _shuffle_write_bytes()
    df.write.format("noop").mode("overwrite").save()
    after = _shuffle_write_bytes()
    if before is None or after is None:
        return None
    return after - before


class _conf:
    """Scoped conf set/restore (the probe must not leak settings into
    later trials — same discipline as sources/replay._pin_hermetic_*)."""

    def __init__(self, spark, **kv):
        self.spark = spark
        self.kv = {k.replace("__", "."): v for k, v in kv.items()}
        self.prev: dict[str, str | None] = {}

    def __enter__(self):
        for k, v in self.kv.items():
            try:
                self.prev[k] = self.spark.conf.get(k)
            except Exception:
                self.prev[k] = None
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, prev in self.prev.items():
            if prev is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, prev)
        return False


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from streambench_spark.catalog import load_table
    from streambench_spark.plans.ysb import ysb_query
    from streambench_spark.session import get_spark
    from streambench_spark.sources import generators as gen

    spark = get_spark(
        app_name="plan-sensitivity-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Materialize the generated fact once so every trial pays a real
    # parquet scan (the generator would otherwise hide scan behavior).
    # user_id is remapped onto the customer key domain so the join does
    # real probe work (generator user_ids would miss the dim entirely);
    # value is a deterministic hash-derived double.
    campaigns = gen.gen_campaigns(spark, 100, 10)
    customer = load_table(spark, sf_dir, "customer")
    ncust = customer.count()
    tmp = tempfile.mkdtemp(prefix="sb_sensitivity_")
    fact_path = os.path.join(tmp, "events.parquet")
    t0 = time.perf_counter()
    raw = gen.gen_events_batch(spark, campaigns, n, events_per_second=200_000)
    fact = raw.select(
        "event_idx",
        (F.pmod(F.hash("event_idx"), F.lit(ncust)) + 1)
        .cast("long")
        .alias("user_id"),
        F.col("event_time").alias("ts"),
        "event_type",
        (F.pmod(F.hash(F.col("event_idx") * 7), F.lit(10000)) / 100.0).alias(
            "value"
        ),
    )
    fact.repartition(32).write.mode("overwrite").parquet(fact_path)
    gen_s = round(time.perf_counter() - t0, 3)
    events = spark.read.parquet(fact_path)

    out: dict = {"num_events": n, "generate_write_s": gen_s, "trials": {}}

    # -- 1. join strategy: broadcast (production) vs forced shuffle join
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    # the generator's user_id domain must overlap the dim's keys for the
    # join to do real work; events user_id is modulo the campaign count
    # domain, customer keys are 1..N — both small-int domains, fine.
    ysb = ysb_query(events, customer, window="1 hour")
    t_bcast = _noop_time(ysb)
    b_bcast = _run_with_shuffle_bytes(ysb)
    plain = (
        events.filter(F.col("event_type") == "view")
        .select("user_id", "ts")
        .join(dim, "user_id")  # no hint
        .groupBy(F.window("ts", "1 hour"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("count"), F.max("ts").alias("last_update"))
    )
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        strategy = [
            x
            for x in plain._jdf.queryExecution().executedPlan().toString().split("\n")
            if "Join" in x
        ]
        t_shuffle = _noop_time(plain)
        b_shuffle = _run_with_shuffle_bytes(plain)
    out["trials"]["join_strategy"] = {
        "broadcast_s": t_bcast,
        "shuffle_join_s": t_shuffle,
        "shuffle_over_broadcast": round(t_shuffle / t_bcast, 2)
        if t_bcast
        else None,
        "broadcast_shuffle_write_bytes": b_bcast,
        "forced_shuffle_write_bytes": b_shuffle,
        "shuffle_bytes_ratio": round(b_shuffle / b_bcast, 1)
        if b_bcast and b_shuffle is not None
        else None,
        "forced_plan_node": strategy[0].strip()[:120] if strategy else None,
    }

    # -- 2. shuffle partitions × AQE coalescing (1M-group hash agg so the
    # exchange carries real reduce-side cardinality)
    def user_agg():
        return events.groupBy(
            (F.col("event_idx") % 1_000_000).alias("g")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_v"),
            F.max("ts").alias("last_ts"),
        )

    sp: dict = {}
    for parts in (8, 32, 128, 512):
        with _conf(spark, **{"spark.sql.shuffle.partitions": str(parts)}):
            sp[f"aqe_on_{parts}"] = _noop_time(user_agg())
    with _conf(
        spark,
        **{
            "spark.sql.shuffle.partitions": "512",
            "spark.sql.adaptive.enabled": "false",
        },
    ):
        sp["aqe_off_512"] = _noop_time(user_agg())
    out["trials"]["shuffle_partitions"] = sp

    # -- 3. scan split size
    scan: dict = {}
    win_sum = (
        events.groupBy(F.window("ts", "1 minute"))
        .agg(F.sum("value").alias("sum_v"), F.count(F.lit(1)).alias("n"))
    )
    for size in ("33554432", "134217728", "536870912"):
        with _conf(spark, **{"spark.sql.files.maxPartitionBytes": size}):
            scan[f"max_part_{int(size) // (1 << 20)}m"] = _noop_time(win_sum)
    out["trials"]["scan_split"] = scan

    # -- 4. sketch vs exact: shuffle bytes as key cardinality grows
    from streambench_spark.operators.aggregates import kmv_retained_partial
    from streambench_spark.operators.sketches import count_min_build

    sketch: dict = {}
    for card in (100_000, 2_000_000):
        keyed = events.select(
            F.pmod(F.hash("event_idx"), F.lit(card)).alias("key"),
            "event_type",
        )
        exact = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
        t_exact = _noop_time(exact)
        b_exact = _run_with_shuffle_bytes(exact)
        cms = count_min_build(keyed, "key", depth=4, width=2048)
        t_cms = _noop_time(cms)
        b_cms = _run_with_shuffle_bytes(cms)
        exact_distinct = keyed.groupBy("event_type").agg(
            F.countDistinct("key").alias("nd")
        )
        t_exd = _noop_time(exact_distinct)
        b_exd = _run_with_shuffle_bytes(exact_distinct)
        kmv = kmv_retained_partial(keyed, ["event_type"], "key", k=32)
        t_kmv = _noop_time(kmv)
        b_kmv = _run_with_shuffle_bytes(kmv)
        sketch[f"card_{card}"] = {
            "exact_count_s": t_exact,
            "exact_count_shuffle_bytes": b_exact,
            "cms_build_s": t_cms,
            "cms_build_shuffle_bytes": b_cms,
            "exact_distinct_s": t_exd,
            "exact_distinct_shuffle_bytes": b_exd,
            "kmv_partial_s": t_kmv,
            "kmv_partial_shuffle_bytes": b_kmv,
        }
    out["trials"]["sketch_shuffle"] = sketch

    # -- 5. decontamination: exact anti-join (no broadcast) vs Bloom probe
    from streambench_spark.llm.hashing import spark_hash32
    from streambench_spark.operators.sketches import bloom_build, bloom_probe

    n_banned = 1_000_000
    keyed = events.select(
        F.pmod(F.hash("event_idx"), F.lit(2_000_000)).alias("key"), "value"
    )
    banned = spark.range(n_banned).select(
        (F.col("id") * 2).alias("key")  # every even key in [0, 2M)
    )
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        exact_anti = keyed.join(banned, "key", "left_anti")
        t_anti = _noop_time(exact_anti)
        b_anti = _run_with_shuffle_bytes(exact_anti)
    m_words = 16_384  # 1 Mbit for 1M keys at k=3 — same sizing rule
    banned_h = banned.select(
        F.expr(spark_hash32("CAST(key AS STRING)")).alias("h")
    )
    bloom = bloom_build(banned_h, "h", m_words=m_words, k=3)
    t_build = _noop_time(bloom)
    b_build = _run_with_shuffle_bytes(bloom)
    probe_in = keyed.withColumn(
        "h", F.expr(spark_hash32("CAST(key AS STRING)"))
    )
    # the probe flags rows PRESENT in the filter (no false negatives —
    # every truly-banned row is flagged; decontaminate = drop flagged)
    survivors = bloom_probe(probe_in, bloom, "h", m_words=m_words, k=3)
    t_probe = _noop_time(survivors)
    b_probe = _run_with_shuffle_bytes(survivors)
    out["trials"]["bloom_decontaminate"] = {
        "n_banned": n_banned,
        "exact_anti_join_s": t_anti,
        "exact_anti_join_shuffle_bytes": b_anti,
        "bloom_build_s": t_build,
        "bloom_build_shuffle_bytes": b_build,
        "bloom_probe_s": t_probe,
        "bloom_probe_shuffle_bytes": b_probe,
    }

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
