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
