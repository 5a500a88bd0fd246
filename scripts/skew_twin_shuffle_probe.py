"""Shuffle-byte pricing of the skew_safe text twins (r10 follow-up to
the r09 hot-key crossover probe).

The crossover probe priced the two plans in WALL TIME and found the
count-window default faster at any single-machine scale (SCALE.md).
Local mode prices shuffle at memory speed, though — on a cluster the
exchanges cross the network, so the cost dimension that actually moves
at 1000 executors is exchange VOLUME. This probe records shuffle-write
bytes per (corpus, operator, plan) via the UI REST deltas (same
mechanism as plan_sensitivity_probe), on the crossover probe's two
corpora:

  uniform — 8 hash-derived tokens per doc, ~100k vocab, no hot key
  hot     — the same plus a universal leading stopword 'the' in EVERY
            doc (the Zipfian regime the skew_safe knob exists for)

Questions answered with numbers:
  1. How much extra exchange volume does skew_safe=True pay for its
     AQE-splittable shape (the df partial-agg shuffle + join exchanges
     vs the window's one exchange of the aggregated stream)?
  2. Does the hot key change either plan's VOLUME (it shouldn't much:
     the window ships the same aggregated rows, just badly placed; the
     join's partial agg collapses the hot key per map partition)?

Usage: python scripts/skew_twin_shuffle_probe.py [n_docs]   (default 2M)
Prints one JSON object; SCALE.md cites the recorded numbers.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from plan_sensitivity_probe import (  # noqa: E402
    _noop_time,
    _run_with_shuffle_bytes,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from pyspark.sql import functions as F

    from streambench_spark.llm.text import (
        bigram_logprob_scores,
        tfidf_top_terms,
    )
    from streambench_spark.session import get_spark

    spark = get_spark(
        app_name="skew-twin-shuffle-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # hash-derived tokens: ~100k vocab, deterministic, no Python row work
    def tok(expr: str) -> str:
        return f"concat('t', pmod(hash({expr}), 100000))"

    body = ", ".join(tok(f"id * 8 + {i}") for i in range(7))
    tmp = tempfile.mkdtemp(prefix="sb_skewtwin_")
    corpora: dict[str, str] = {}
    for name, lead in (("uniform", tok("id * 8 + 7")), ("hot", "'the'")):
        path = os.path.join(tmp, f"{name}.parquet")
        (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.expr(f"concat_ws(' ', {lead}, {body})").alias("text"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
        )
        corpora[name] = path

    out: dict = {"n_docs": n, "trials": {}}
    for cname, path in corpora.items():
        docs = spark.read.parquet(path)
        for fn in (tfidf_top_terms, bigram_logprob_scores):
            for label, kwargs in (
                ("window", {}),
                ("skew_safe", {"skew_safe": True}),
            ):
                # clearCache() drops the persisted tf/bigram caches but
                # NOT materialized lazy-localCheckpoint RDDs — those are
                # reclaimed by the ContextCleaner only after the frame's
                # py4j reference is finalized. Each trial therefore
                # builds its frame as a dead temporary and hints
                # gc.collect() after clearing, so every construction
                # starts from equivalent storage state instead of
                # accumulating checkpoint RDDs across the 16 trials
                # (ADVICE r10).
                def _cleanup() -> None:
                    spark.catalog.clearCache()
                    gc.collect()

                # warm the EXACT measured plan once (micro-bench
                # discipline: cold-start bias burned r07/r08 readings)
                fn(docs, **kwargs).write.format("noop").mode(
                    "overwrite"
                ).save()
                _cleanup()
                t = _noop_time(fn(docs, **kwargs), reps=2)
                _cleanup()
                b = _run_with_shuffle_bytes(fn(docs, **kwargs))
                _cleanup()
                out["trials"][f"{cname}.{fn.__name__}.{label}"] = {
                    "best_s": t,
                    "shuffle_write_bytes": b,
                }
    for fn_name in ("tfidf_top_terms", "bigram_logprob_scores"):
        for cname in corpora:
            w = out["trials"][f"{cname}.{fn_name}.window"]
            s = out["trials"][f"{cname}.{fn_name}.skew_safe"]
            if w["shuffle_write_bytes"] and s["shuffle_write_bytes"]:
                out["trials"][f"{cname}.{fn_name}.bytes_ratio"] = round(
                    s["shuffle_write_bytes"] / w["shuffle_write_bytes"], 2
                )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
