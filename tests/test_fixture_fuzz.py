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

import os
import shutil
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from scripts.oracle_check import normalize

import __spark_entry__ as _entry

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
        rows.append((i, ts, user, etype, v, "{}"))
    return shape, rows


def _write_events(tmp: str, rows) -> None:
    # timestamp("us") with no tz -> parquet isAdjustedToUTC=false, the
    # organic testdata's MICROS flavor (catalog normalizes either way)
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(tbl, os.path.join(tmp, "events.parquet"))


def _run_fuzz(spark, tmp: str, table: str, names, shape) -> None:
    qs = _entry.queries()
    oracles = _entry.oracle_sql()
    missing = [n for n in names if n not in qs or n not in oracles]
    assert not missing, f"fuzzed names fell out of the registry: {missing}"
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM '{tmp}/{table}.parquet'"
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
@settings(max_examples=5, deadline=None)
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
        v = draw(st.integers(min_value=0, max_value=56000)) / 100.0
        etype = draw(st.sampled_from(["view", "click", "cart", "purchase"]))
        rows.append((i, ts, uid, etype, v, "{}"))
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
