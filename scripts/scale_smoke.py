"""Scale smoke: run the core plans on generator-produced volume far above
the sf0.1 testdata (default 20M events, ~33x sf0.1) to catch designs that
only work small — driver collects, single-partition sorts, unbounded
state. Not part of the driver contract; run manually:

    python scripts/scale_smoke.py [num_events]

Prints one timing line per stage. Every stage executes end-to-end with a
noop write (nothing returns to the driver).

Measured 2026-08-13 on local[32] (single JVM; re-measured same day
after the TIMESTAMP_NTZ testdata change — within run-to-run variance):
    n=20M : generate 12-14M rows/s, ysb 9-11M rows/s,
            windowed_global_sum 22-24M rows/s, salted hot-key agg 18-21M rows/s
    n=100M: generate 58.9M rows/s, ysb 17.1M rows/s,
            windowed_global_sum 78.3M rows/s, salted hot-key agg 90.6M rows/s
LLM stages (same run, n=20M → 2M docs / 200k vectors):
    doc_stats 0.4M docs/s (40-token docs ≈ 16M tokens/s),
    chunk_docs 1.0M docs/s, banded-LSH neardup 200k vectors in 5.7s
    (4x8-bit bands — 256 buckets/band keeps every cell's matmul small)
(The reference's published target configuration is 2M events/s —
BASELINE.md; the YSB plan here sustains ~8x that on one node.)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    from pyspark.sql import functions as F

    from streambench_spark.plans.ysb import ysb_query
    from streambench_spark.operators import windows as win
    from streambench_spark.operators.aggregates import salted_grouped_agg
    from streambench_spark.session import get_spark
    from streambench_spark.sources import generators as gen

    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    campaigns = gen.gen_campaigns(spark, 100, 10)
    events = gen.gen_events_batch(spark, campaigns, n, events_per_second=200_000)
    # adapt generator schema to the YSB plan contract
    ev = events.select(
        F.col("ad_id").alias("user_id"),
        F.col("event_time").alias("ts"),
        "event_type",
    )
    dim = campaigns.select(
        F.col("ad_id").alias("c_custkey"), F.col("campaign_id").alias("c_mktsegment")
    )

    def stage(label, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f}s ({n / dt / 1e6:.1f}M rows/s)", flush=True)

    stage("generate-only", ev)
    stage("ysb", ysb_query(ev, dim, window="10 seconds"))
    stage(
        "windowed_global_sum",
        win.windowed_global_agg(
            ev, "ts", "1 minute", [F.count(F.lit(1)).alias("n")]
        ),
    )
    stage(
        "salted_hot_key_agg",
        salted_grouped_agg(
            # worst-case skew: constant key
            ev.withColumn("k", F.lit("hot")),
            keys=["k"],
            partial_aggs=[F.count(F.lit(1)).alias("pn")],
            final_aggs=[F.sum("pn").alias("n")],
        ),
    )

    # LLM-family stages on generated volume (docs/embeddings far above
    # the sf0.1 tables) — catches per-cell memory blowups and narrow-map
    # regressions the tiny corpora can't.
    from streambench_spark.llm.similarity import cosine_neardup_pairs_lsh
    from streambench_spark.llm.text import chunk_docs, doc_stats

    n_docs = max(n // 10, 1_000_000)
    vocab = ", ".join(f"'w{i}'" for i in range(100))
    docs = spark.range(0, n_docs, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(0, 39), i -> "
            f"element_at(array({vocab}), pmod(hash(id * 40 + i), 100) + 1)), ' ')"
        ).alias("text"),
    )

    def stage_n(label, df, rows):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f}s ({rows / dt / 1e6:.1f}M rows/s)", flush=True)

    stage_n(f"doc_stats n={n_docs}", doc_stats(docs), n_docs)
    stage_n(f"chunk_docs n={n_docs}", chunk_docs(docs, chunk_tokens=16), n_docs)

    n_vec = max(n // 100, 100_000)
    emb = spark.range(0, n_vec, 1, 64).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), i -> "
            "CAST(pmod(hash(id, i), 2001) - 1000 AS FLOAT) / 1000.0)"
        ).alias("embedding"),
    )
    # band_bits sized to the corpus: 256 buckets/band keeps each cell's
    # matmul small — the documented bucket-fits-memory knob in action
    stage_n(
        f"lsh_neardup n={n_vec} (4x8-bit bands)",
        cosine_neardup_pairs_lsh(emb, 0.9, n_bands=4, band_bits=8),
        n_vec,
    )


if __name__ == "__main__":
    main()
