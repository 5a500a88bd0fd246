"""Both hash modes (md5 oracle-portable / xxhash64 production) must
uphold the operator invariants: dedup behavior, Bloom FP bounds and
zero false negatives, CMS never-undercount, split proportions and
determinism. The md5 mode is additionally oracle-checked end-to-end by
the registry gate; these property tests are what stands behind the
xxhash64 mode (DuckDB has no xxhash64, so no SQL oracle can).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

MODES = ["md5", "xxhash64"]


def _docs(spark):
    """Synthetic corpus with planted exact and near duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark woods to hide from the loud hunters"
    )
    rows = [
        (1, base),
        (2, base),  # exact duplicate of 1
        (3, base.replace("dark", "cold")),  # near duplicate of 1
        (4, "completely different text about spark sql aggregation plans "
            "and the catalyst optimizer rewriting logical trees"),
        (5, "yet another unrelated document mentioning bloom filters "
            "count sketches and minhash signatures for deduplication"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("mode", MODES)
def test_hash_domain_nonnegative_32bit(spark, mode):
    """Both modes emit values in [0, 2^32): the domain every downstream
    `% P` / `% width` / `(a*h + b) % P` relies on for overflow safety."""
    from streambench_spark.llm.hashing import spark_hash32

    h = spark_hash32("CAST(id AS STRING)", mode=mode)
    r = (
        spark.range(10_000)
        .select(F.expr(h).alias("h"))
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .first()
    )
    assert r["lo"] >= 0
    assert r["hi"] < 2**32


def test_unknown_hash_mode_rejected():
    from streambench_spark.llm.hashing import spark_hash32

    with pytest.raises(ValueError):
        spark_hash32("x", mode="sha1")


@pytest.mark.parametrize("mode", MODES)
def test_minhash_dedup_invariants(spark, mode):
    """Identical texts get identical signatures (hence identical band
    keys — the LSH collision guarantee); the planted near-dup pair is
    found and the unrelated docs are not paired, in BOTH modes."""
    from streambench_spark.llm.dedup import minhash_lsh_pairs, minhash_signatures

    docs = _docs(spark)
    sigs = {
        r["doc_id"]: tuple(r["sig"])
        for r in minhash_signatures(docs, num_hashes=16, hash_mode=mode).collect()
    }
    assert sigs[1] == sigs[2]  # exact duplicate: identical signature
    assert sigs[1] != sigs[4]  # unrelated: different signature
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, threshold=0.5, num_hashes=16, bands=8, hash_mode=mode
        ).collect()
    }
    assert (1, 2) in pairs  # exact dup always survives verify
    assert (1, 3) in pairs  # one-token edit: J >> 0.5, bands collide
    assert not any(4 in p or 5 in p for p in pairs)  # no false pairs


@pytest.mark.parametrize("mode", MODES)
def test_simhash_identical_docs_collide(spark, mode):
    from streambench_spark.llm.dedup import simhash_fingerprints

    fp = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(_docs(spark), hash_mode=mode).collect()
    }
    assert fp[1] == fp[2]
    assert fp[1] != fp[4]


@pytest.mark.parametrize("mode", MODES)
def test_bloom_no_false_negatives_and_fp_bound(spark, mode):
    """Bloom invariants per mode: every member tests positive (one-sided
    error) and the measured FP rate over disjoint non-members stays
    within 3x the analytic (1 - e^{-kn/m})^k bound — a hash mode that
    broke uniformity or collapsed the k probes would blow through it."""
    from streambench_spark.operators.sketches import (
        BITS_PER_WORD,
        bloom_build,
        bloom_probe,
    )

    m_words, k, n_members, n_probes = 64, 3, 500, 4000
    members = spark.range(n_members).select(F.col("id").alias("h"))
    bloom = bloom_build(members, m_words=m_words, k=k, hash_mode=mode)
    assert bloom_probe(
        members, bloom, m_words=m_words, k=k, hash_mode=mode
    ).count() == n_members
    non_members = spark.range(1_000_000, 1_000_000 + n_probes).select(
        F.col("id").alias("h")
    )
    fp = bloom_probe(
        non_members, bloom, m_words=m_words, k=k, hash_mode=mode
    ).count()
    m_bits = m_words * BITS_PER_WORD
    analytic = (1.0 - math.exp(-k * n_members / m_bits)) ** k
    assert fp / n_probes <= 3 * analytic, (mode, fp / n_probes, analytic)


@pytest.mark.parametrize("mode", MODES)
def test_cms_never_undercounts(spark, mode):
    """CMS estimate >= true count for every key, and equals it when the
    sketch is wide relative to the key set, in both modes."""
    from streambench_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
    )

    truth = {f"k{i}": i + 1 for i in range(50)}
    rows = [(k,) for k, c in truth.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "key string")
    sketch = count_min_build(df, "key", depth=4, width=512, hash_mode=mode)
    keys = spark.createDataFrame([(k,) for k in truth], "key string")
    est = {
        r["key"]: r["est"]
        for r in count_min_estimate(
            sketch, keys, "key", depth=4, width=512, hash_mode=mode
        ).collect()
    }
    assert all(est[k] >= c for k, c in truth.items())
    # 50 keys into 4x512 cells: collisions are possible but the total
    # overestimate must stay tiny
    assert sum(est[k] - c for k, c in truth.items()) <= 10


@pytest.mark.parametrize("mode", MODES)
def test_split_proportions_and_determinism(spark, mode):
    """with_split keeps ~train_pct% in train, is idempotent across
    re-runs, and never moves a key between splits when the corpus is
    re-ordered — in both modes."""
    from streambench_spark.llm.sampling import with_split

    docs = spark.range(5000).select(F.col("id").alias("doc_id"))
    out = with_split(docs, hash_mode=mode)
    frac = out.filter(F.col("split") == "train").count() / 5000
    assert abs(frac - 0.90) < 0.05, (mode, frac)
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["split"])
        for r in with_split(
            docs.orderBy(F.desc("doc_id")), hash_mode=mode
        ).collect()
    )
    assert a == b


def test_modes_produce_different_draws(spark):
    """The mode knob is actually wired: the two modes assign different
    buckets (if they agreed, the parameter would be decorative)."""
    from streambench_spark.llm.sampling import with_split

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    md5 = {r["doc_id"]: r["bucket"] for r in with_split(docs).collect()}
    xx = {
        r["doc_id"]: r["bucket"]
        for r in with_split(docs, hash_mode="xxhash64").collect()
    }
    assert md5 != xx


@pytest.mark.parametrize("mode", MODES)
def test_weighted_topn_deterministic(spark, mode):
    from streambench_spark.llm.sampling import weighted_topn_sample

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    a = sorted(r["doc_id"] for r in weighted_topn_sample(
        docs, 50, "w", hash_mode=mode).collect())
    b = sorted(r["doc_id"] for r in weighted_topn_sample(
        docs, 50, "w", hash_mode=mode).collect())
    assert a == b and len(a) == 50


# KMV merge-losslessness and the partial≡plain identity are pinned in
# BOTH modes by the parametrized tests in tests/test_sketches.py (the
# single home of that construction); this file adds the estimator-side
# invariants.
@pytest.mark.parametrize("mode", MODES)
def test_kmv_estimate_exact_below_k_and_monotone(spark, mode):
    """Below k distinct the sketch is EXACT; above it the estimate grows
    monotonically over nested value sets and stays within a loose
    relative band of the truth — both modes (deterministic hashes, so
    this is a stable check, not a flaky statistical one)."""
    from streambench_spark.operators.aggregates import kmv_distinct

    k = 32
    small = spark.range(10).select(
        F.lit(0).alias("g"), F.col("id").alias("v")
    )
    r = kmv_distinct(small, ["g"], "v", k, hash_mode=mode).first()
    assert r["n_kept"] == 10 and r["estimate"] == 10.0
    ests = []
    for n in (200, 2000, 20000):
        df = spark.range(n).select(F.lit(0).alias("g"), F.col("id").alias("v"))
        est = kmv_distinct(df, ["g"], "v", k, hash_mode=mode).first()["estimate"]
        assert abs(est / n - 1.0) < 0.6, (mode, n, est)
        ests.append(est)
    assert ests == sorted(ests), (mode, ests)


@pytest.mark.parametrize("mode", MODES)
def test_span_dedup_counts_invariants(spark, mode):
    """Cross-doc span dedup: an exact duplicate's spans are all dups of
    the first occurrence; a unique doc has zero dup spans — both modes."""
    from streambench_spark.llm.dedup import span_dedup_counts

    docs = _docs(spark)
    out = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in span_dedup_counts(docs, span=5, hash_mode=mode).collect()
    }
    assert out[2][0] == out[1][0] and out[2][1] == out[2][0]  # all spans dup
    assert out[1][1] == 0 and out[4][1] == 0
