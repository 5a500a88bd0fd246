"""Measured per-row cost: md5 (oracle-portable) vs xxhash64 (production)
hash mode at 20M rows — the evidence behind llm/hashing.py's claim that
the mode switch converts the oracle-portability tax into a flipped knob.

Three probes, each timed end-to-end into a noop sink on local[32]:
  raw        — one bare hash per row (the kernel cost itself)
  bloom      — bloom_probe over 20M keys vs a 1M-key sketch (2 hash
               chains/row + k array probes; the decontamination shape
               where hashing dominated in the r06 plan probe)
  minhash16  — 16-perm MinHash signatures over ~1.2M shingle postings
               per 100k docs replicated to ~20M postings (1 hash/posting
               + 16 modular mins)
  kmv        — kmv_retained over 20M rows / 32 groups / k=32 (1 hash/row
               + distinct + windowed top-k; added r08 with the KMV
               hash_mode threading)

Usage: python scripts/hash_mode_probe.py  (prints one JSON line last)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from streambench_spark.llm.hashing import spark_hash32  # noqa: E402
from streambench_spark.session import get_spark  # noqa: E402

N = 20_000_000


def timed(build) -> float:
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="hash-mode-probe", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(N).select(F.col("id").alias("h")).localCheckpoint()

    out: dict = {"rows": N, "probes": {}}

    # raw kernel: one hash per row
    for mode in ("md5", "xxhash64"):
        h = spark_hash32("CAST(h AS STRING)", mode=mode)
        timed(lambda: base.select(F.expr(h).alias("x")))  # warm
        out["probes"][f"raw_{mode}_s"] = timed(
            lambda: base.select(F.expr(h).alias("x"))
        )

    # bloom probe: 20M rows vs a 1M-key sketch (2 chains + k probes/row)
    from streambench_spark.operators.sketches import bloom_build, bloom_probe

    members = spark.range(1_000_000).select(F.col("id").alias("h"))
    for mode in ("md5", "xxhash64"):
        bloom = bloom_build(members, m_words=16384, k=3, hash_mode=mode)
        out["probes"][f"bloom_{mode}_s"] = timed(
            lambda: bloom_probe(base, bloom, m_words=16384, k=3, hash_mode=mode)
        )

    # minhash: 100k short docs -> explode to ~20M postings equivalent by
    # replicating the posting stream; measures hash + 16 modular mins
    from streambench_spark.llm.dedup import minhash_signatures

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    docs = (
        spark.range(100_000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.lit(words[i % 10])
                    for i in range(12)
                ],
                F.col("id").cast("string"),
            ).alias("text"),
        )
        .crossJoin(F.broadcast(spark.range(20).select(F.col("id").alias("_r"))))
        .withColumn("doc_id", F.col("doc_id") + F.col("_r") * 1_000_000)
        .drop("_r")
        .localCheckpoint()
    )
    for mode in ("md5", "xxhash64"):
        out["probes"][f"minhash16_{mode}_s"] = timed(
            lambda: minhash_signatures(docs, num_hashes=16, hash_mode=mode)
        )

    # kmv: 20M rows, 32 groups, k=32 retained per group (1 hash/row +
    # distinct + windowed top-k; r08 — the knob now covers the KMV family)
    from streambench_spark.operators.aggregates import kmv_retained

    kmv_in = (
        spark.range(N)
        .select((F.col("id") % 32).alias("g"), F.col("id").alias("v"))
        .localCheckpoint()
    )
    # warm the distinct+window plan shape once so first-job setup cost
    # doesn't land in whichever mode is timed first
    timed(lambda: kmv_retained(kmv_in, ["g"], "v", 32, hash_mode="md5"))
    for mode in ("md5", "xxhash64"):
        out["probes"][f"kmv_{mode}_s"] = timed(
            lambda: kmv_retained(kmv_in, ["g"], "v", 32, hash_mode=mode)
        )

    for fam in ("raw", "bloom", "minhash16", "kmv"):
        md5_t = out["probes"][f"{fam}_md5_s"]
        xx_t = out["probes"][f"{fam}_xxhash64_s"]
        out["probes"][f"{fam}_speedup"] = round(md5_t / xx_t, 2) if xx_t else None

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
