"""Fixture-dir oracle fuzzing: run REGISTERED queries and their DuckDB
oracles side-by-side on hypothesis-generated miniature events tables —
adversarial shapes the organic sf data never produces (zero-variance
groups, a single row, one event type, every timestamp tied, all values
zero). The per-round oracle gate proves Spark == DuckDB on ORGANIC
data; this suite proves the agreement is a property of the semantics,
not of the data the driver happened to generate.

Found on first run (r13): value_correlation crashed with an ANSI
DIVIDE_BY_ZERO on any zero-variance group — one degenerate event_type
at corpus scale would have killed the whole query — while the oracle
returned NULL. Same class in both PCA queries: an all-zero covariance
matrix (identical or single vectors) made the power-iteration
normalization divide by max(|w|) == 0. All three now yield the
oracle's NULLs; organic-data results are bit-unchanged.
"""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from scripts.oracle_check import normalize
from scripts.universe_fuzz import write_universe

import __spark_entry__ as _entry

# Default pytest runs keep the heavy sweeps short (ADVICE r13: the
# embeddings sweep alone cost ~6.6 min at 5 examples in every default
# invocation); the round-close gate exports STREAMBENCH_FUZZ_FULL=1 to
# run the full example counts.
_FULL = os.environ.get("STREAMBENCH_FUZZ_FULL", "") == "1"

# Events-only batch queries (the fixture writes only events.parquet).
# Every name must stay registered with an oracle; the test fails fast
# on a missing one rather than silently shrinking coverage.
FUZZED_QUERIES = [
    "top_k_users", "value_histogram", "activity_gini", "mad_by_type",
    "modal_value_by_type", "benford_digit_test", "ewma_hourly_value",
    "collated_event_types", "equidepth_histogram", "interarrival_histogram",
    "grouped_max", "global_percentiles", "grouped_percentiles",
    "hourly_anomalies", "dau_mau_stickiness", "funnel_conversion",
    "value_correlation", "lag_event_deltas", "moving_avg_value",
    "cumulative_unique_users", "daily_value_bands",
    # the nine ANSI-divide-by-zero fixes of r13, pinned here so the
    # degenerate shapes that crashed them stay covered
    "value_autocorr", "hourly_ccf_purchase_error", "mannwhitney_value_drift",
    "moments_by_type", "revenue_pareto", "revenue_share_by_type",
    "segment_linear_trend", "session_conversion_rate", "twap_value_per_user",
    # r14 sweep: the remaining events-only queries whose plans contain
    # data-dependent division / log — the crash-risk class this suite
    # exists to cover
    "analytic_rank_functions", "chi2_independence",
    "histogram_sketch_quantiles", "kmv_set_operations",
    "weekly_revenue_growth", "psi_value_drift", "ks_value_drift",
    "weekday_seasonality", "session_bounce_rate", "user_behavior_entropy",
    "session_type_affinity",
]

_BASE_TS = 1_700_000_000  # epoch seconds; fixture spans <= 3 days


@st.composite
def _events_fixture(draw):
    """Rows for a miniature events table, biased toward degenerate
    shapes: the shape picks the nasty axis, the row draws fill it in."""
    shape = draw(st.sampled_from([
        "organic", "constant_value", "one_type", "one_hour",
        "one_row", "zero_values", "one_user_ties",
    ]))
    n = 1 if shape == "one_row" else draw(st.integers(min_value=1, max_value=40))
    n_users = 1 if shape == "one_user_ties" else draw(
        st.integers(min_value=1, max_value=4)
    )
    types = ["view"] if shape == "one_type" else [
        "view", "click", "cart", "purchase",
    ]
    rows = []
    for i in range(n):
        if shape == "one_hour":
            ts = _BASE_TS + draw(st.integers(min_value=0, max_value=3599))
        elif shape == "one_user_ties":
            ts = _BASE_TS
        else:
            ts = _BASE_TS + draw(st.integers(min_value=0, max_value=3 * 86400))
        # sub-second jitter, biased to boundary µs — the axis the r13
        # whole-second fixtures missed (the dynamic-gap/lag-sweep µs-vs-
        # ms grain splits only show when an event sits INSIDE a boundary
        # millisecond); tie shapes keep exact ties (us=0)
        us = 0 if shape == "one_user_ties" else draw(
            st.sampled_from([0, 0, 0, 1, 999, 1000, 500_000, 999_999])
        )
        if shape == "constant_value":
            v = 123.45
        elif shape == "zero_values":
            v = 0.0
        else:
            # 2dp cents like the organic generator — the engines' shared
            # round(value*100) convention is proven on this domain
            v = draw(st.integers(min_value=0, max_value=56000)) / 100.0
        user = draw(st.integers(min_value=0, max_value=n_users - 1))
        etype = draw(st.sampled_from(types))
        rows.append((i, ts * 1_000_000 + us, user, etype, v, "{}"))
    return shape, rows


def _write_events(tmp: str, rows) -> None:
    # timestamp("us") with no tz -> parquet isAdjustedToUTC=false, the
    # organic testdata's MICROS flavor (catalog normalizes either way).
    # r[1] is epoch-MICROSECONDS (r14: fixtures carry sub-second jitter).
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(tbl, os.path.join(tmp, "events.parquet"))


def _run_fuzz(spark, tmp: str, table, names, shape) -> None:
    qs = _entry.queries()
    oracles = _entry.oracle_sql()
    missing = [n for n in names if n not in qs or n not in oracles]
    assert not missing, f"fuzzed names fell out of the registry: {missing}"
    con = duckdb.connect()
    try:
        for t in [table] if isinstance(table, str) else table:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet'"
            )
        for name in names:
            df = qs[name](spark, tmp)
            got = normalize([tuple(r) for r in df.collect()], df.columns)
            rel = con.sql(oracles[name])
            want = normalize(
                [tuple(r) for r in rel.fetchall()], list(rel.columns)
            )
            assert got == want, (name, shape, got[:3], want[:3])
    finally:
        con.close()


@given(_events_fixture())
@settings(max_examples=6, deadline=None)
def test_registered_queries_match_oracles_on_adversarial_fixtures(spark, case):
    shape, rows = case
    tmp = tempfile.mkdtemp(prefix="fixture_fuzz_")
    try:
        _write_events(tmp, rows)
        _run_fuzz(spark, tmp, "events", FUZZED_QUERIES, shape)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Documents-only queries — the LLM text/dedup surface, where the nasty
# axes are textual: duplicate corpora, single-token docs, punctuation-
# only docs, non-ASCII (accents + CJK).
FUZZED_DOC_QUERIES = [
    "corpus_stats", "doc_fingerprint", "gopher_quality_rules", "grep_docs",
    "wordcount_top20", "bigram_lm_score", "chunk_docs", "chunk_docs_overlap",
    "doc_stats", "exact_dedup", "dedup_keep_best", "lang_id",
    "token_counts", "tfidf_top_terms", "pii_scrub", "neardup_containment",
    "neardup_clusters", "minhash_lsh_neardup", "simhash_fingerprint",
    "span_dedup", "contamination_scores", "source_vocab_overlap",
    # r14 sweep: documents-only queries with data-dependent division/log
    "split_ngram_coverage", "hapax_ratio_by_source", "token_dispersion",
    "zipf_slope",
    # r14 universe find: byte-vs-codepoint levenshtein on non-ASCII
    # prefixes — the suite's unicode shape keeps it covered
    "edit_distance_neighbors",
]

_DOC_VOCAB = [
    "the", "of", "and", "data", "spark", "x", "email", "a@b.co",
    "####", "...", "zebra", "qq",
]


@st.composite
def _documents_fixture(draw):
    shape = draw(st.sampled_from([
        "organic", "one_doc", "dup_docs", "empty_ish", "one_word", "unicode",
    ]))
    n = 1 if shape == "one_doc" else draw(st.integers(min_value=1, max_value=10))
    docs = []
    for i in range(n):
        if shape == "dup_docs":
            words = ["the", "data", "spark"] * 4
        elif shape == "one_word":
            words = ["x"]
        elif shape == "empty_ish":
            words = [draw(st.sampled_from([".", "-", "x"]))]
        elif shape == "unicode":
            words = draw(st.lists(
                st.sampled_from(["café", "naïve", "東京", "mañana", "the"]),
                min_size=1, max_size=15,
            ))
        else:
            words = draw(st.lists(
                st.sampled_from(_DOC_VOCAB), min_size=1, max_size=40,
            ))
        text = " ".join(words)
        docs.append((
            i, text,
            draw(st.sampled_from(["en", "fr", "xx"])),
            draw(st.sampled_from(["web", "book"])),
            len(text),
        ))
    return shape, docs


def _write_documents(tmp: str, docs) -> None:
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(tmp, "documents.parquet"))


@given(_documents_fixture())
@settings(max_examples=5, deadline=None)
def test_document_queries_match_oracles_on_adversarial_fixtures(spark, case):
    shape, docs = case
    tmp = tempfile.mkdtemp(prefix="fixture_fuzz_docs_")
    try:
        _write_documents(tmp, docs)
        _run_fuzz(spark, tmp, "documents", FUZZED_DOC_QUERIES, shape)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Embeddings-only queries — the similarity/linear-algebra surface, where
# the nasty axes are geometric: zero-norm vectors, fully identical
# corpora (zero covariance), a single vector, one label, axis-aligned
# one-hot vectors (maximal ties).
FUZZED_EMB_QUERIES = [
    "embedding_centroids", "embedding_covariance", "embedding_ivf_topk",
    "embedding_lsh_multiprobe_topk", "embedding_lsh_topk",
    "embedding_norm_stats", "embedding_quantize_int8",
    "embedding_topk_cosine", "kmeans_assign_step", "kmeans_iterations",
    "neardup_embedding_cosine", "neardup_embedding_lsh",
    "pca_top_component", "pca_variance_explained",
    # r14 sweep: recall_bp divides by the exact-pair count — 0 on any
    # corpus with no near-dup pairs (e.g. a single vector)
    "neardup_lsh_recall_report",
]

_EMB_DIM = 64


@st.composite
def _embeddings_fixture(draw):
    shape = draw(st.sampled_from([
        "organic", "one_vec", "zero_vecs", "identical", "one_label",
        "axis_aligned",
    ]))
    n = 1 if shape == "one_vec" else draw(st.integers(min_value=1, max_value=20))
    coord = st.integers(min_value=-1000, max_value=1000)
    proto = [draw(coord) / 1000.0 for _ in range(_EMB_DIM)]
    vecs, labels = [], []
    for i in range(n):
        if shape == "zero_vecs":
            v = [0.0] * _EMB_DIM
        elif shape == "identical":
            v = list(proto)
        elif shape == "axis_aligned":
            v = [0.0] * _EMB_DIM
            v[i % _EMB_DIM] = 1.0
        else:
            v = [draw(coord) / 1000.0 for _ in range(_EMB_DIM)]
        vecs.append(v)
        labels.append(0 if shape == "one_label" else draw(
            st.integers(min_value=0, max_value=3)
        ))
    return shape, vecs, labels


def _write_embeddings(tmp: str, vecs, labels) -> None:
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, os.path.join(tmp, "embeddings.parquet"))


@given(_embeddings_fixture())
@settings(max_examples=5 if _FULL else 2, deadline=None)
def test_embedding_queries_match_oracles_on_adversarial_fixtures(spark, case):
    shape, vecs, labels = case
    tmp = tempfile.mkdtemp(prefix="fixture_fuzz_emb_")
    try:
        _write_embeddings(tmp, vecs, labels)
        _run_fuzz(spark, tmp, "embeddings", FUZZED_EMB_QUERIES, shape)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Events + customer join queries — the dim-join surface, where the
# nasty axes are relational: broken foreign keys (events whose user has
# no customer row), a hot user owning ~90% of events, a single-row dim,
# an empty filtered segment (bloom built over zero members), and every
# timestamp tied on one window boundary.
FUZZED_JOIN_QUERIES = [
    "ysb", "ysb_10s", "bloom_join_prune", "validate_events",
    "conversion_rate_ci", "skew_salted_enrichment",
]

_SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY"]


@st.composite
def _join_fixture(draw):
    shape = draw(st.sampled_from([
        "organic", "no_fk_match", "hot_user", "one_customer",
        "no_building_segment", "ts_ties",
    ]))
    n = draw(st.integers(min_value=1, max_value=40))
    n_cust = 1 if shape == "one_customer" else draw(
        st.integers(min_value=1, max_value=8)
    )
    segs = [
        s for s in _SEGMENTS
        if not (shape == "no_building_segment" and s == "BUILDING")
    ]
    cust = [
        (
            k, f"Customer#{k}",
            draw(st.integers(min_value=0, max_value=24)),
            draw(st.integers(min_value=-99900, max_value=999900)) / 100.0,
            draw(st.sampled_from(segs)),
        )
        for k in range(n_cust)
    ]
    rows = []
    for i in range(n):
        if shape == "no_fk_match":
            uid = n_cust + draw(st.integers(min_value=0, max_value=5))
        elif shape == "hot_user":
            uid = draw(st.sampled_from([0] * 9 + [n_cust - 1]))
        else:
            # n_cust+1 upper bound: some FK breaks in organic draws too
            uid = draw(st.integers(min_value=0, max_value=n_cust + 1))
        ts = _BASE_TS if shape == "ts_ties" else _BASE_TS + draw(
            st.integers(min_value=0, max_value=2 * 86400)
        )
        us = 0 if shape == "ts_ties" else draw(
            st.sampled_from([0, 0, 0, 1, 999, 1000, 500_000, 999_999])
        )
        v = draw(st.integers(min_value=0, max_value=56000)) / 100.0
        etype = draw(st.sampled_from(["view", "click", "cart", "purchase"]))
        rows.append((i, ts * 1_000_000 + us, uid, etype, v, "{}"))
    return shape, rows, cust


def _write_customer(tmp: str, cust) -> None:
    tbl = pa.table({
        "c_custkey": pa.array([c[0] for c in cust], pa.int64()),
        "c_name": pa.array([c[1] for c in cust], pa.string()),
        "c_nationkey": pa.array([c[2] for c in cust], pa.int32()),
        "c_acctbal": pa.array([c[3] for c in cust], pa.float64()),
        "c_mktsegment": pa.array([c[4] for c in cust], pa.string()),
    })
    pq.write_table(tbl, os.path.join(tmp, "customer.parquet"))


def test_r14_universe_regressions(spark):
    """Deterministic pin of the r14 universe-fuzz finds (the full wide
    sweep — every registry query x 4 complete adversarial universes —
    lives in scripts/universe_fuzz.py, run at round close): the
    dynamic-gap session µs/ms grain split, the lag-sweep helper's ms
    floor (session_conversion_rate / session_type_affinity), the
    F.round shortest-repr half-boundary in embedding_norm_stats, and
    the interval-trigger drain stalling on mis-attributed numInputRows
    (ysb_trigger_early_fire — pinned on the one universe that stalled;
    each drain costs ~15 s)."""
    fast = [
        "session_windows_dynamic_gap", "session_windows_dynamic_gap_streaming",
        "session_conversion_rate", "session_type_affinity",
        "embedding_norm_stats",
    ]
    for kind in ("ties_one", "zeros", "dups", "organic_small"):
        tmp = tempfile.mkdtemp(prefix="fixture_fuzz_universe_")
        try:
            write_universe(tmp, kind)
            names = fast + (["ysb_trigger_early_fire"] if kind == "zeros" else [])
            _run_fuzz(spark, tmp, list(_TPCH_TABLES) + [
                "events", "documents", "embeddings",
            ], names, kind)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


# Structured-Streaming queries — watermark, session-merge, GroupState,
# and dedup-within-watermark logic on degenerate event-time shapes: all
# timestamps tied (watermark never passes any session end), a single
# row, all-zero values (stateful sums), and duplicate event_ids with
# microsecond-level ties (dedup + CDC ordering). Deterministic pin (not
# hypothesis): each streaming query spins up a real availableNow query
# with its own sink/checkpoint, so examples are seconds each; these
# four shapes are the named nasty axes.
FUZZED_STREAMING_QUERIES = [
    "stateful_running_counts", "stateful_value_stats",
    "session_windows_streaming", "session_windows_dynamic_gap_streaming",
    "sliding_window_streaming", "hypertable_rollup_streaming",
    "streaming_dedup", "streaming_dedup_within_watermark",
    "cdc_latest_state", "cdc_with_deletes", "interval_join_streaming",
]


def _events_rows_us(rows):
    """rows of (event_id, ts_s, us, user_id, event_type, value)."""
    return [
        (eid, ts_s * 1_000_000 + us, uid, et, v, "{}")
        for eid, ts_s, us, uid, et, v in rows
    ]


def test_streaming_queries_match_oracles_on_degenerate_fixtures(spark):
    shapes = {
        "ts_ties": [(i, _BASE_TS, 0, i % 2, "view", 5.0) for i in range(6)],
        "one_row": [(0, _BASE_TS, 0, 0, "view", 1.23)],
        "zero_vals": [
            (i, _BASE_TS + i * 1800, 0, i % 3,
             ["view", "click", "cart", "purchase"][i % 4], 0.0)
            for i in range(10)
        ],
        "dup_ids_us": [
            (i % 3, _BASE_TS + i * 7, i % 2, i % 2, "view", 2.5)
            for i in range(8)
        ],
    }
    for shape, rows in shapes.items():
        tmp = tempfile.mkdtemp(prefix="fixture_fuzz_stream_")
        try:
            _write_events(tmp, _events_rows_us(rows))
            _run_fuzz(spark, tmp, "events", FUZZED_STREAMING_QUERIES, shape)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


# TPC-H star-schema queries — the never-fuzzed family VERDICT r13 named
# as the round's one real defect: tpch_q14/tpch_q8 carried the exact
# unguarded `/ sum(cents)` ANSI DIVIDE_BY_ZERO class the r13 round fixed
# in 12 events-family queries, and the derived-partsupp bridge divides
# by the supplier COUNT (empty supplier table => DIV/% by zero, reached
# whenever AQE's empty-relation propagation doesn't happen to skip the
# stage). Nasty axes here are relational + arithmetic: all-zero revenue
# (zero prices / 100% discounts => zero denominators), an empty dim
# table, broken foreign keys, one row, every date tied on a query
# window boundary.
FUZZED_TPCH_QUERIES = [
    "tpch_q1_pricing_summary", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority", "tpch_q4_order_priority",
    "tpch_q5_local_supplier", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_type_profit", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q12_shipping_modes",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue", "tpch_q18_large_volume",
    "tpch_q19_discounted_revenue", "tpch_q20_potential_promotion",
    "tpch_q21_waiting_supplier", "tpch_q22_global_sales_opportunity",
    # r14 sweep: lineitem-only analytics with data-dependent division/log
    "frequent_itempairs", "copurchase_degree_distribution",
]

_TPCH_TABLES = [
    "lineitem", "orders", "customer", "supplier", "part", "nation", "region",
]

# AMERICA nations (n_regionkey == 1) — q8's customer-region filter; the
# zero_price shape pins customers here so the q8 join chain produces
# rows whose year-group revenue sum is exactly 0 (the crash trigger).
_AMERICA_NATIONS = [1, 6, 11, 16, 21]

_D0 = datetime.datetime(1995, 1, 1)


def _day(offset: int) -> datetime.datetime:
    return _D0 + datetime.timedelta(days=offset)


@st.composite
def _tpch_fixture(draw):
    shape = draw(st.sampled_from([
        "organic", "zero_price", "discount_one", "one_row",
        "date_ties", "empty_supplier", "broken_fk",
    ]))
    n_li = 1 if shape == "one_row" else draw(
        st.integers(min_value=1, max_value=30)
    )
    n_ord = draw(st.integers(min_value=1, max_value=10))
    n_cust = draw(st.integers(min_value=1, max_value=6))
    n_supp = 0 if shape == "empty_supplier" else draw(
        st.integers(min_value=1, max_value=5)
    )
    n_part = draw(st.integers(min_value=1, max_value=8))

    price2 = st.integers(min_value=0, max_value=9_999_999)  # cents, 2dp
    disc2 = st.integers(min_value=0, max_value=10)  # hundredths

    def fk(n: int) -> int:
        # broken_fk points some keys past the dim (organic draws may
        # break too, like the events join fixture); others stay valid
        if shape == "broken_fk" and draw(st.booleans()):
            return n + draw(st.integers(min_value=0, max_value=3))
        return draw(st.integers(min_value=0, max_value=max(n - 1, 0)))

    customer = [
        (
            k, f"Customer#{k}",
            draw(st.sampled_from(_AMERICA_NATIONS)) if shape == "zero_price"
            else draw(st.integers(min_value=0, max_value=24)),
            draw(st.integers(min_value=-99900, max_value=999900)) / 100.0,
            draw(st.sampled_from([
                "BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE",
            ])),
        )
        for k in range(n_cust)
    ]
    supplier = [
        (
            k, f"Supplier#{k}",
            draw(st.integers(min_value=0, max_value=24)),
            draw(st.integers(min_value=-99900, max_value=999900)) / 100.0,
        )
        for k in range(n_supp)
    ]
    part = [
        (
            k,
            draw(st.sampled_from([
                "small bolt", "small widget", "large bolt",
                "cold widget", "blue rod",
            ])),
            draw(st.sampled_from([
                "Brand#12", "Brand#13", "Brand#14", "Brand#45", "Brand#1",
            ])),
            draw(st.sampled_from(["ECONOMY", "PROMO"]))
            if shape == "zero_price"
            else draw(st.sampled_from([
                "ECONOMY", "PROMO", "STANDARD", "SMALL", "MEDIUM", "LARGE",
            ])),
            draw(st.integers(min_value=1, max_value=50)),
            draw(price2) / 100.0,
        )
        for k in range(n_part)
    ]
    orders = []
    for k in range(n_ord):
        if shape == "date_ties":
            od = _day(152)  # 1995-06-01
        elif shape == "zero_price":
            od = _day(draw(st.integers(min_value=0, max_value=729)))  # 95-96
        else:
            od = _day(draw(st.integers(min_value=0, max_value=2555)))  # ..2001
        orders.append((
            k, fk(n_cust),
            draw(st.sampled_from(["P", "O", "F"])),
            draw(price2) / 100.0, od,
            draw(st.sampled_from([
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
            ])),
        ))
    lineitem = []
    for i in range(n_li):
        if shape == "date_ties":
            sd = _day(987)  # 1997-09-15, inside the q14 month window
        elif shape == "zero_price":
            sd = _day(draw(st.integers(min_value=973, max_value=1002)))
        else:
            sd = _day(draw(st.integers(min_value=0, max_value=2555)))
        lineitem.append((
            fk(n_ord), fk(n_part), fk(n_supp) if n_supp else 0,
            draw(st.integers(min_value=1, max_value=7)),
            float(draw(st.integers(min_value=1, max_value=50))),
            0.0 if shape == "zero_price" else draw(price2) / 100.0,
            1.0 if shape == "discount_one" else draw(disc2) / 100.0,
            draw(st.integers(min_value=0, max_value=8)) / 100.0,
            draw(st.sampled_from(["A", "N", "R"])),
            draw(st.sampled_from(["O", "F"])),
            sd,
        ))
    return shape, lineitem, orders, customer, supplier, part


def _write_tpch(tmp, lineitem, orders, customer, supplier, part) -> None:
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in lineitem], pa.int64()),
        "l_partkey": pa.array([r[1] for r in lineitem], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in lineitem], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in lineitem], pa.int32()),
        "l_quantity": pa.array([r[4] for r in lineitem], pa.float64()),
        "l_extendedprice": pa.array([r[5] for r in lineitem], pa.float64()),
        "l_discount": pa.array([r[6] for r in lineitem], pa.float64()),
        "l_tax": pa.array([r[7] for r in lineitem], pa.float64()),
        "l_returnflag": pa.array([r[8] for r in lineitem], pa.string()),
        "l_linestatus": pa.array([r[9] for r in lineitem], pa.string()),
        "l_shipdate": pa.array([r[10] for r in lineitem], pa.timestamp("us")),
    }), os.path.join(tmp, "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
        "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
        "o_orderstatus": pa.array([r[2] for r in orders], pa.string()),
        "o_totalprice": pa.array([r[3] for r in orders], pa.float64()),
        "o_orderdate": pa.array([r[4] for r in orders], pa.timestamp("us")),
        "o_orderpriority": pa.array([r[5] for r in orders], pa.string()),
    }), os.path.join(tmp, "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([r[0] for r in customer], pa.int64()),
        "c_name": pa.array([r[1] for r in customer], pa.string()),
        "c_nationkey": pa.array([r[2] for r in customer], pa.int32()),
        "c_acctbal": pa.array([r[3] for r in customer], pa.float64()),
        "c_mktsegment": pa.array([r[4] for r in customer], pa.string()),
    }), os.path.join(tmp, "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([r[0] for r in supplier], pa.int64()),
        "s_name": pa.array([r[1] for r in supplier], pa.string()),
        "s_nationkey": pa.array([r[2] for r in supplier], pa.int32()),
        "s_acctbal": pa.array([r[3] for r in supplier], pa.float64()),
    }), os.path.join(tmp, "supplier.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([r[0] for r in part], pa.int64()),
        "p_name": pa.array([r[1] for r in part], pa.string()),
        "p_brand": pa.array([r[2] for r in part], pa.string()),
        "p_type": pa.array([r[3] for r in part], pa.string()),
        "p_size": pa.array([r[4] for r in part], pa.int32()),
        "p_retailprice": pa.array([r[5] for r in part], pa.float64()),
    }), os.path.join(tmp, "part.parquet"))
    # nation/region are canonical constants in the testdata (25 nations
    # round-robin over 5 regions) — queries hard-code their names, so
    # the fixture ships the real dims rather than fuzzing them
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }), os.path.join(tmp, "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(
            ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"], pa.string()
        ),
    }), os.path.join(tmp, "region.parquet"))


def test_tpch_divide_guards_regression(spark):
    """Deterministic pin of the r14 guard triggers (hypothesis sampling
    may skip a shape in a short default run): a zero-revenue fixture
    whose rows land inside tpch_q14's month and tpch_q8's year windows
    (denominator sum == 0 WITH rows present — unguarded ANSI raised
    DIVIDE_BY_ZERO, the oracle returns NULL), and an empty supplier
    table run with AQE off so empty-relation propagation cannot skip the
    derived-partsupp bridge whose DIV/% by the supplier count is the
    other crash site."""
    lineitem = [
        # orderkey partkey suppkey line qty extprice disc tax rf ls shipdate
        (0, 0, 0, 1, 5.0, 0.0, 0.0, 0.0, "N", "O", _day(987)),
        (0, 1, 0, 2, 3.0, 0.0, 0.0, 0.0, "R", "F", _day(987)),
        (1, 0, 0, 1, 7.0, 123.45, 1.0, 0.05, "A", "O", _day(990)),
    ]
    orders = [
        (0, 0, "F", 0.0, _day(152), "1-URGENT"),
        (1, 0, "O", 0.0, _day(400), "5-LOW"),
    ]
    customer = [(0, "Customer#0", 1, 100.0, "BUILDING")]  # nation 1 = AMERICA
    supplier = [(0, "Supplier#0", 5, 0.0)]
    part = [
        (0, "small bolt", "Brand#12", "ECONOMY", 25, 1.0),
        (1, "large rod", "Brand#13", "PROMO", 10, 2.0),
    ]
    tmp = tempfile.mkdtemp(prefix="fixture_fuzz_tpch_pin_")
    try:
        _write_tpch(tmp, lineitem, orders, customer, supplier, part)
        _run_fuzz(
            spark, tmp, _TPCH_TABLES,
            ["tpch_q14_promo_revenue", "tpch_q8_market_share"],
            "pinned_zero_revenue",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    tmp = tempfile.mkdtemp(prefix="fixture_fuzz_tpch_pin_")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        _write_tpch(tmp, lineitem, orders, customer, [], part)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        _run_fuzz(
            spark, tmp, _TPCH_TABLES,
            ["tpch_q2_min_cost_supplier", "tpch_q11_important_stock",
             "tpch_q20_potential_promotion", "tpch_q15_top_supplier"],
            "pinned_empty_supplier",
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        shutil.rmtree(tmp, ignore_errors=True)


@given(_tpch_fixture())
@settings(max_examples=5 if _FULL else 3, deadline=None)
def test_tpch_queries_match_oracles_on_adversarial_fixtures(spark, case):
    shape, lineitem, orders, customer, supplier, part = case
    tmp = tempfile.mkdtemp(prefix="fixture_fuzz_tpch_")
    try:
        _write_tpch(tmp, lineitem, orders, customer, supplier, part)
        _run_fuzz(spark, tmp, _TPCH_TABLES, FUZZED_TPCH_QUERIES, shape)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(_join_fixture())
@settings(max_examples=5, deadline=None)
def test_join_queries_match_oracles_on_adversarial_fixtures(spark, case):
    shape, rows, cust = case
    tmp = tempfile.mkdtemp(prefix="fixture_fuzz_join_")
    try:
        _write_events(tmp, rows)
        _write_customer(tmp, cust)
        qs = _entry.queries()
        oracles = _entry.oracle_sql()
        missing = [
            n for n in FUZZED_JOIN_QUERIES if n not in qs or n not in oracles
        ]
        assert not missing, f"fuzzed names fell out of the registry: {missing}"
        con = duckdb.connect()
        try:
            for t in ("events", "customer"):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet'"
                )
            for name in FUZZED_JOIN_QUERIES:
                df = qs[name](spark, tmp)
                got = normalize([tuple(r) for r in df.collect()], df.columns)
                rel = con.sql(oracles[name])
                want = normalize(
                    [tuple(r) for r in rel.fetchall()], list(rel.columns)
                )
                assert got == want, (name, shape, got[:3], want[:3])
        finally:
            con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
