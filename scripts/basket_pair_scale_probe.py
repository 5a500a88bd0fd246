"""Does the r11 basket-local pair expansion HOLD at larger volume?

    python scripts/basket_pair_scale_probe.py [copies]   # default 8

The r11 A/B that introduced the rewrite also showed its limits: the
same edge builder that wins for single-pass consumers LOSES for the
iterative graph consumers at sf0.1. Local wins do not transfer blindly
— so before claiming the itempairs/degree rewrite scales, measure it
above the shipped SF. This probe replicates lineitem ``copies``× with
SHIFTED order keys (baskets keep their width — the quantity that
bounds the per-row pair expansion — while order count grows linearly,
which is exactly how a bigger corpus grows: more baskets, not wider
ones) and times both pair-expansion strategies on the frequent-
itempairs pair-count core and the degree-distribution core, plus
shuffle-write bytes per variant (UI REST deltas — the cluster-network
cost local wall-clock cannot price).

Expected if the rewrite's reasoning is right: the basket-local path's
advantage GROWS with volume (it shuffles the corpus once vs twice into
the join, and pair expansion stays map-side), and its shuffle bytes
stay well under the self-join's. Prints one JSON object; SCALE.md
cites the recorded numbers.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

REPO = __file__.rsplit("/scripts/", 1)[0]
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import urllib.request

_UI = "http://localhost:4050/api/v1"


def _completed_stages() -> list | None:
    try:
        with urllib.request.urlopen(f"{_UI}/applications", timeout=5) as r:
            app_id = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{_UI}/applications/{app_id}/stages?status=complete", timeout=5
        ) as r:
            return json.load(r)
    except Exception:
        return None


def _shuffle_write_bytes() -> int | None:
    """Sum shuffleWriteBytes over completed stages, polling until the
    completed-stage COUNT stabilizes first. stages?status=complete
    silently excludes stages still finalizing when sampled, which
    undercounts the post-run delta on a loaded host (ADVICE r11) — two
    consecutive identical counts 0.3 s apart means finalization drained."""
    prev = -1
    for _ in range(20):  # <= 6 s worst case
        stages = _completed_stages()
        if stages is None:
            return None
        if len(stages) == prev:
            return sum(s.get("shuffleWriteBytes", 0) for s in stages)
        prev = len(stages)
        time.sleep(0.3)
    # Never stabilized: an unsettled sum would undercount exactly the way
    # the loop exists to prevent (ADVICE r12) — report "unknown" instead.
    print("warning: completed-stage count never stabilized; "
          "shuffle-write bytes not sampled", file=sys.stderr)
    return None


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from pyspark.sql import SparkSession, functions as F

    from streambench_spark.catalog import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("basket-pair-scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    li0 = load_table(spark, "/root/testdata/sf0.1", "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    max_ok = li0.agg(F.max("l_orderkey")).collect()[0][0]
    rep = li0
    for i in range(1, copies):
        rep = rep.unionAll(
            li0.select(
                (F.col("l_orderkey") + i * (max_ok + 1)).alias("l_orderkey"),
                "l_partkey",
            )
        )
    # Materialize the replicated input to parquet and SCAN it in every
    # variant — the registry shape. (An earlier draft localCheckpoint'd
    # the input and dropped the self-join side's distinct(); that hid
    # the scan-twice cost AND compared different semantics — lineitem
    # repeats a part within an order, so the join side needs the dedup
    # the basket side gets from collect_set.)
    # try/finally + rmtree: repeated probe runs were accumulating
    # hundreds of MB of replicated lineitem in /tmp (ADVICE r11)
    import shutil

    src = tempfile.mkdtemp(prefix="sb_bpair_")
    try:
        _run_probe(spark, rep, src, copies)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _run_probe(spark, rep, src: str, copies: int) -> None:
    from pyspark.sql import functions as F

    rep.repartition(32).write.mode("overwrite").parquet(src)

    def li():
        return spark.read.parquet(src)

    def selfjoin_pairs():
        baskets = li().distinct()
        return (
            baskets.alias("a")
            .join(baskets.alias("b"), F.expr(
                "a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"))
            .groupBy(
                F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
            )
            .agg(F.count(F.lit(1)).alias("cab"))
        )

    def basket_pairs():
        arr = li().groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("items")
        )
        return (
            arr.select(F.explode("items").alias("pa"), "items")
            .select(
                "pa",
                F.explode(F.filter("items", lambda x: x > F.col("pa"))).alias("pb"),
            )
            .groupBy("pa", "pb")
            .agg(F.count(F.lit(1)).alias("cab"))
        )

    def deg_selfjoin():
        e = (
            li().alias("a")
            .join(li().alias("b"), F.expr(
                "a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"))
            .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
            .distinct()
        )
        return (
            e.select(F.col("src").alias("n"))
            .unionAll(e.select(F.col("dst").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )

    def deg_basket():
        arr = li().groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("items")
        )
        e = (
            arr.select(F.explode("items").alias("src"), "items")
            .select(
                "src",
                F.explode(F.filter("items", lambda x: x > F.col("src"))).alias("dst"),
            )
            .distinct()
        )
        return (
            e.select(F.col("src").alias("n"))
            .unionAll(e.select(F.col("dst").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )

    tasks = {
        "pairs.selfjoin": selfjoin_pairs,
        "pairs.basket_local": basket_pairs,
        "degree.selfjoin": deg_selfjoin,
        "degree.basket_local": deg_basket,
    }

    def once(mk) -> float:
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out: dict = {"copies": copies, "input_rows": li().count(), "trials": {}}
    for mk in tasks.values():  # warm the exact measured plans once
        once(mk)
    times: dict[str, list[float]] = {k: [] for k in tasks}
    for _ in range(5):  # interleaved — r11's noisy-gauge lesson
        for k, mk in tasks.items():
            times[k].append(once(mk))
    for k, mk in tasks.items():
        b0 = _shuffle_write_bytes()
        once(mk)
        b1 = _shuffle_write_bytes()
        out["trials"][k] = {
            "median_s": round(statistics.median(times[k]), 3),
            "all_s": [round(x, 2) for x in times[k]],
            "shuffle_write_bytes": (b1 - b0) if (b0 is not None and b1 is not None) else None,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
