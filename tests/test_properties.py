"""Property-based tests (hypothesis): operator semantics vs tiny pure-
Python models on randomized inputs — the §5.2 'semantics, not snapshots'
strategy. Example counts are kept small because every example round-trips
through Spark."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from streambench_spark.operators.relational import asof_join

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=50)


@st.composite
def asof_case(draw):
    quotes = draw(
        st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12, unique=True)
    )
    probes = draw(st.lists(st.tuples(KEYS, TS), min_size=1, max_size=8))
    return quotes, probes


@given(asof_case())
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_python_model(spark, case):
    quotes_rows, probes_rows = case
    # quote value = a deterministic function of (key, ts); unique per (k, ts)
    quotes = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in quotes_rows], "k long, t long, qv long"
    )
    probes = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(probes_rows)],
        "pid long, k long, t long",
    )
    got = {
        (r["pid"], r["qv"])
        for r in asof_join(
            probes, quotes, key="k", probe_ts="t", quote_ts="t", quote_cols=["qv"]
        ).collect()
    }
    want = set()
    for i, (k, t) in enumerate(probes_rows):
        eligible = [(qt, k * 1000 + qt) for qk, qt in quotes_rows if qk == k and qt <= t]
        if eligible:
            want.add((i, max(eligible)[1]))
    assert got == want


def test_asof_join_carries_null_quote_fields_atomically(spark):
    """A NULL field inside the matched quote row must be carried as-is:
    per-column carry-forward would stitch it with an older quote's value,
    and a NULL in the first quote column must not drop the match."""
    quotes = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 20, None, None), (1, 30, 300, "c")],
        "k long, t long, px long, tag string",
    )
    probes = spark.createDataFrame(
        [(0, 1, 25), (1, 1, 35), (2, 1, 15)], "pid long, k long, t long"
    )
    got = {
        r["pid"]: (r["px"], r["tag"])
        for r in asof_join(
            probes, quotes, key="k", probe_ts="t", quote_ts="t",
            quote_cols=["px", "tag"],
        ).collect()
    }
    # probe@25 matches quote@20 (all-NULL fields, still a match, not stitched
    # with quote@10's values); probe@35 → quote@30; probe@15 → quote@10
    assert got == {0: (None, None), 1: (300, "c"), 2: (100, "a")}


@given(
    st.lists(
        st.text(alphabet="abc xyz", min_size=1, max_size=40).filter(
            lambda s: s.strip()
        ),
        min_size=1, max_size=6,
    ),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=15, deadline=None)
def test_chunk_docs_roundtrip_preserves_tokens(spark, texts, chunk_tokens):
    """Chunking must partition each document's token stream exactly:
    concatenating a doc's chunks in chunk_idx order reproduces the full
    lowercased token sequence, every chunk but the last is full, and
    n_tokens sums to the doc's token count."""
    import re

    from streambench_spark.llm.text import chunk_docs

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = chunk_docs(docs, chunk_tokens=chunk_tokens).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in enumerate(texts):
        toks = re.split(r"\s+", text.lower())
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        joined = " ".join(r["chunk_text"] for r in rows).split(" ")
        assert joined == toks
        assert sum(r["n_tokens"] for r in rows) == len(toks)
        for r in rows[:-1]:
            assert r["n_tokens"] == chunk_tokens
