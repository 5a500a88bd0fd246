"""Regenerate PLANS.md: formatted physical plans for the flagship
queries, with the properties each plan must keep (pushdown, broadcast,
shuffle count) stated so regressions are visible in review.

    python scripts/dump_plans.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

FLAGSHIPS = {
    "ysb": (
        "Filter+projection reach the scan; dim side BroadcastExchange "
        "(fact never shuffles for the join); ONE Exchange at the "
        "(window, segment) hash aggregate with partial_count/partial_max "
        "map-side."
    ),
    "tpch_q6_forecast_revenue": (
        "All four predicates in PushedFilters; ReadSchema is the 4 used "
        "columns; single partial/final aggregate, no join."
    ),
    "tpch_q5_local_supplier": (
        "Five BroadcastHashJoins; lineitem scans straight into the join "
        "chain and first shuffles at groupBy(n_name)."
    ),
    "neardup_ngram_jaccard": (
        "Explode-first postings (codegen, no lambda re-evaluation below "
        "the exchange); ONE evaluation of the shingle pipeline (sized "
        "postings: groupBy collect_set then explode, set size carried on "
        "the rows); SortMergeJoin self-join so both sides share the "
        "shuffle-on-h; pair aggregate reads sizes via min()."
    ),
    "embedding_ivf_topk": (
        "One Exchange on the cell id, then ArrowEvalPython "
        "(applyInPandas) per cell — the quadratic work is a dense matmul "
        "inside each cell."
    ),
    "hypertable_rollup": (
        "Raw events shuffled ONCE (minute groupBy with partial_count/"
        "partial_sum); hour and day levels re-aggregate the previous "
        "rollup output — no second scan of events anywhere."
    ),
    "neardup_ngram_jaccard_capped": (
        "df cap via a count window riding the shared shuffle-on-h (no "
        "separate groupBy+join); every join bucket bounded by max_df; "
        "verify joins candidates to one-row-per-doc set arrays and "
        "intersects row-locally (no posting-level join)."
    ),
    "funnel_conversion": (
        "All three stage aggregates and both joins hash on user_id — one "
        "partitioning chain; the final counts are 1-row aggregates "
        "cross-joined (BroadcastNestedLoopJoin of single rows)."
    ),
    "dataset_shuffle": (
        "ONE range exchange on the salt hash (sampled bounds — no single-"
        "reducer global sort) + per-partition sort + Arrow enumerate "
        "(zipWithIndex two-pass; a pid window would add a second full "
        "hash exchange), localCheckpoint-ed so the sizes branch reads "
        "the materialized partitions; cumulative offsets joined back via "
        "BroadcastExchange. The final plan shows the post-checkpoint "
        "LogicalRDD."
    ),
    "decontaminate": (
        "Corpus postings stream RAW into a BroadcastHashJoin probe "
        "(benchmark gram set is the build side) — no Exchange below the "
        "join on the corpus side; the count-distinct Exchanges carry "
        "only matched rows."
    ),
    "neardup_embedding_lsh": (
        "ONE Exchange on (band, bucket) — the exploded band keys, never "
        "an all-pairs product; each cell is a dense BLAS matmul inside "
        "ArrowEvalPython (applyInPandas, same kernel as embedding_ivf_"
        "topk); the distinct Exchange carries only qualifying "
        "(id_a, id_b, sim) scalars."
    ),
    "chunk_docs": (
        "Narrow map only: tokenize once, Generate explodes a CHEAP index "
        "sequence (never the token array), per-chunk slice after the "
        "explode; no key Exchange — the only Exchange is _docs' "
        "round-robin repartition of the single-file testdata source "
        "(absent on a properly-partitioned lake table)."
    ),
    "span_dedup": (
        "First-occurrence min(struct) aggregate has map-side partial min "
        "(skew-safe: a viral span adds one row per map partition to its "
        "shuffle, not one per copy); at this SF the aggregate output is "
        "broadcast so the posting probe side has NO Exchange at all — at "
        "100 TB AQE falls back to SMJ where both sides reuse the same "
        "hash-on-h partitioning; final Exchange on doc_id only."
    ),
    "tpch_q8_market_share": (
        "Every dim predicate (p_type, r_name, o_orderdate window) in "
        "PushedFilters; six-plus BroadcastHashJoins for the dims; the "
        "only fact-fact edge is lineitem-orders, left to the planner "
        "(SMJ pre-AQE, broadcast at runtime when the filtered orders "
        "side is small); one hash Exchange at the tiny per-year "
        "aggregate."
    ),
    "tpch_q2_min_cost_supplier": (
        "The derived partsupp bridge is pure codegen over the part scan "
        "(Generate over a 4-element sequence + DISTINCT); EU suppliers "
        "and the size/type-filtered part list broadcast; ONE hash "
        "Exchange on ps_partkey feeds the window min; top-100 is "
        "TakeOrderedAndProject."
    ),
    "tfidf_top_terms": (
        "ONE corpus scan (r08 re-plan, pinned by "
        "test_tfidf_single_corpus_scan): df is a count window over the "
        "single (doc_id, term, tf) table — no join, no second "
        "scan+explode+agg pipeline; one Exchange on term for the df "
        "window, one on doc_id for the ranking; WindowGroupLimit pushes "
        "the per-doc top-k below the final Exchange."
    ),
    "skew_salted_enrichment": (
        "Fact side carries the deterministic xxhash64 salt as a narrow "
        "projection (no Exchange to salt); the dim side's 8-way "
        "replicate is a Generate over a literal array; join key is "
        "(user_id, _salt) so a hot user spreads over 8 reducers; final "
        "aggregate Exchange is event_type-cardinality."
    ),
    "gopher_quality_rules": (
        "Single codegen scan: every rule flag is an integer-exact "
        "cross-multiplied comparison over per-row token/line arrays — "
        "zero Exchanges, zero Python, the one-pass 100 TB filter shape."
    ),
    "events_partitioned_source": (
        "Since the r07 bisect the filter runs on the duplicated DATA "
        "copy of event_type (PushedFilters, data-scan predicate) so the "
        "partition-value directory readback is excluded from the output "
        "path; the PartitionFilters directory-prune behavior of the same "
        "layout is pinned separately in tests/test_plans.py on a direct "
        "partition-column filter. One 1-row global aggregate above."
    ),
    "profile_columns": (
        "One scan + one Expand feeds all per-column count/count-distinct "
        "aggregates (multi-distinct planning), instead of one scan per "
        "profiled column; output unpivoted by a Generate (stack)."
    ),
    "cms_heavy_hitters": (
        "Sketch build: Generate (inline coords) -> partial+final "
        "HashAggregate on (d, idx) — the ONLY corpus-sized exchange "
        "carries at most d*w rows per map partition. Estimate side joins "
        "the sketch via BroadcastExchange (probe never shuffles for the "
        "lookup); final per-key min is group-cardinality."
    ),
    "bloom_join_prune": (
        "The bloom words are a driver-materialized DENSE array literal "
        "(bounded O(m_words) — never data-sized); membership is a "
        "row-local Filter (single-eval md5 positions + array element_at "
        "+ bitwise) with NO join delivering the sketch — ZERO fact-side "
        "Exchange anywhere in the plan. The exact dim side is a "
        "BroadcastExchange LeftSemi after the probe-bit filter, so FP "
        "rows die before the join."
    ),
    "copurchase_triangles": (
        "Edge build is the one lineitem self-join on l_orderkey; degree "
        "stamp + wedge + closing joins are all equi-joins exchanged on "
        "node ids (no broadcast of node-cardinality frames, no cartesian "
        "node). Wedge fan-out bounded by the degree-ordered orientation."
    ),
    "pca_top_component": (
        "Covariance pass: two cheap-index Generates expand (i, j<=i) "
        "pairs, the embedding array is projected away BEFORE the "
        "aggregate, and the shuffle carries only (i, j) decimal "
        "partials. Each power-iteration step is a d^2-row join + d-row "
        "aggregate over a localCheckpoint (no lineage growth); the "
        "1-row infinity-norm broadcast-joins back."
    ),
    "frequent_itempairs": (
        "Pair expansion is BASKET-LOCAL (r11): ONE corpus exchange into "
        "groupBy(l_orderkey).collect_set, ordered pairs explode "
        "row-locally from the sorted basket arrays (bounded basket "
        "width — no hot key, no self-join); min-support prunes AT the "
        "pair aggregate; item counts and the 1-row basket total join "
        "back per pair (total broadcast, item counts key-joined)."
    ),
    "kmv_daily_rollup": (
        "ONE raw scan, eager at the retained-frame localCheckpoint "
        "(the plan shows only Scan ExistingRDD: both the per-day and "
        "the merged-total branches read the checkpointed day*k-row "
        "frame, never the parquet twice); every post-scan frame is "
        "day- or k-cardinality."
    ),
    "bigram_lm_score": (
        "TWO corpus scans (r08 re-plan, pinned by "
        "test_bigram_lm_two_corpus_scans): the c12/c1 model counts are "
        "count windows over the single bigram stream (two Exchanges of "
        "that stream — the price the non-broadcast joins paid anyway) "
        "plus the separate unigram scan for V (single-token docs never "
        "enter a bigram); the ONLY join is the 1-row broadcast of V. "
        "Bigram extraction: Generate over the cheap index sequence (no "
        "recomputed-array trap). Per-doc fold is one "
        "ObjectHashAggregate on doc_id."
    ),
}

FLAGSHIPS["global_percentiles"] = (
    "Distributed exact percentile: rangepartitioning + MapInPandas "
    "enumerate in the rank lineage (no unpartitioned Window, no "
    "percentile() buffering aggregate); min/avg/max side joins via "
    "1-row BroadcastNestedLoopJoin cross."
)
FLAGSHIPS["grouped_percentiles"] = (
    "Per-group exact percentile rides ONE hash exchange on event_type "
    "+ spillable window sort; no percentile() buffering aggregate."
)
FLAGSHIPS["kafka_wire_roundtrip"] = (
    "Pure scan-stage codegen: to_json/from_json round-trip through the "
    "exact Kafka source schema — no shuffle, no join."
)


def main() -> None:
    from streambench_spark.plans.queries import REGISTRY
    from streambench_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"

    print("# Physical plans (flagship queries)")
    print()
    print("Generated by `scripts/dump_plans.py` at sf0.01. Each section")
    print("states the properties the plan must keep; regenerate after plan-")
    print("affecting changes and diff.")
    for name, invariant in FLAGSHIPS.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(f"\n## {name}\n")
        print(f"**Must hold:** {invariant}\n")
        print("```")
        print(plan.rstrip())
        print("```")


if __name__ == "__main__":
    main()
