"""Count-Min Sketch and Bloom filter: estimator bounds, mergeability,
and one-sided error — the properties a sketch rollup at 100 TB relies on
(operators/sketches.py)."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from streambench_spark.operators.sketches import (  # noqa: E402
    bloom_build,
    bloom_probe,
    count_min_build,
    count_min_estimate,
)


def _skewed(spark, offset=0):
    """1100 rows over 110 keys: key 0 has 991+ rows, keys 1..109 one each."""
    return spark.range(1100).select(
        F.when(F.col("id") < 991, F.lit(offset))
        .otherwise(F.col("id") - 991 + 1 + offset)
        .alias("k")
    )


def test_cms_never_undercounts_and_is_tight_for_hot_keys(spark):
    df = _skewed(spark)
    sketch = count_min_build(df, "k", depth=4, width=256)
    exact = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    est = {
        r["k"]: r["est"]
        for r in count_min_estimate(
            sketch, df.select("k").distinct(), "k", depth=4, width=256
        ).collect()
    }
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c  # CMS upper bound: min over rows never undercounts
    # the heavy key's estimate is tight (collision noise is a few counts)
    assert est[0] - exact[0] <= 10


def test_cms_merge_equals_whole(spark):
    """sketch(A) + sketch(B) summed cell-wise == sketch(A union B) — the
    mergeability that windowed/daily sketch rollups depend on."""
    a, b = _skewed(spark), _skewed(spark, offset=50)
    merged = (
        count_min_build(a, "k", 4, 256)
        .unionAll(count_min_build(b, "k", 4, 256))
        .groupBy("d", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = count_min_build(a.unionAll(b), "k", 4, 256)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_bloom_no_false_negatives_and_fp_rate(spark):
    members = spark.range(500).select((F.col("id") * 7 + 3).alias("h"))
    bloom = bloom_build(members, "h", m_words=256, k=3)
    # every member tests positive
    assert bloom_probe(members, bloom, "h", 256, 3).count() == 500
    # non-members: FP rate stays near theory ((1-e^{-kn/m})^k ~ 1.5%)
    others = spark.range(10_000, 14_000).select(F.col("id").alias("h"))
    fp = bloom_probe(others, bloom, "h", 256, 3).count()
    assert fp / 4000 < 0.06


def test_bloom_merge_is_bitwise_or(spark):
    a = spark.range(0, 300).select(F.col("id").alias("h"))
    b = spark.range(300, 600).select(F.col("id").alias("h"))
    merged = (
        bloom_build(a, "h", 128, 3)
        .unionAll(bloom_build(b, "h", 128, 3))
        .groupBy("widx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )
    whole = bloom_build(a.unionAll(b), "h", 128, 3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    # and the merged filter accepts everything either side inserted
    assert bloom_probe(a.unionAll(b), merged, "h", 128, 3).count() == 600


def test_bloom_probe_handles_duplicate_rows(spark):
    """count(DISTINCT probe-index) keeps membership correct when the
    same (row, hash) appears twice in the probe input."""
    members = spark.range(50).select(F.col("id").alias("h"))
    bloom = bloom_build(members, "h", 64, 3)
    dup = members.unionAll(members)
    # output is distinct on the input columns (grouped), all members
    assert bloom_probe(dup, bloom, "h", 64, 3).count() == 50
