"""Count-Min Sketch and Bloom filter: estimator bounds, mergeability,
and one-sided error — the properties a sketch rollup at 100 TB relies on
(operators/sketches.py)."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F
import pytest

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


def test_bloom_probe_rejects_streaming_sketch(spark):
    """The eager-sketch guard must be a real raise (survives python -O,
    r07 advice), with a message pointing at the batch contract."""
    probes = spark.range(10).select(F.col("id").alias("h"))
    streaming_bloom = spark.readStream.format("rate").load()
    with pytest.raises(TypeError, match="BATCH"):
        bloom_probe(probes, streaming_bloom, "h", 256, 3)


def test_bloom_probe_rejects_wider_sketch(spark):
    """A sketch built with larger m_words than the probe declares would
    silently lose its upper words — false negatives. Must refuse."""
    members = spark.range(500).select(F.col("id").alias("h"))
    wide = bloom_build(members, "h", m_words=4096, k=3)
    with pytest.raises(ValueError, match="m_words"):
        bloom_probe(members, wide, "h", m_words=2048, k=3)


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


def test_bloom_probe_preserves_row_multiplicity(spark):
    """The row-local probe is a pure filter: duplicate input rows pass
    through as duplicates (no silent grouping)."""
    members = spark.range(50).select(F.col("id").alias("h"))
    bloom = bloom_build(members, "h", 64, 3)
    dup = members.unionAll(members)
    assert bloom_probe(dup, bloom, "h", 64, 3).count() == 100


def test_bloom_probe_plan_single_eval_no_join(spark):
    """Pin the probe's measured cost structure (see bloom_probe docstring;
    59 s -> 7.3 s at 20M rows): the two portable-md5 position chains are
    evaluated ONCE per row each (predicate pushdown re-inlines filter
    aliases regardless of cost, so k positions naively cost 4k md5/row),
    and the sketch words arrive as a literal, never by joining a one-row
    array column (a conditioned BroadcastNestedLoopJoin disables codegen
    and copies the array into every surviving row)."""
    members = spark.range(50).select(F.col("id").alias("h"))
    bloom = bloom_build(members, "h", 64, 3)
    plan = (
        bloom_probe(members, bloom, "h", 64, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("md5") == 2, plan
    assert "Join" not in plan, plan


def test_bloom_probe_plan_single_eval_no_join_xxhash64(spark):
    """The same cost-structure pin for the production hash mode: exactly
    two xxhash64 kernels per row (one per double-hashing chain), zero
    md5, no join — flipping hash_mode must not re-open any of the three
    measured per-row cost traps."""
    members = spark.range(50).select(F.col("id").alias("h"))
    bloom = bloom_build(members, "h", 64, 3, hash_mode="xxhash64")
    plan = (
        bloom_probe(members, bloom, "h", 64, 3, hash_mode="xxhash64")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("xxhash64") == 2, plan
    assert "md5" not in plan, plan
    assert "Join" not in plan, plan


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant edge: K4 has 4 triangles, each K4 node sits in
    exactly 3; the pendant node in none."""
    from streambench_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        ["src", "dst"],
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_celebrity_star(spark):
    """A star (no triangles) plus one rim edge -> exactly one triangle;
    degree-ordered orientation points rim->hub so the hub never fans."""
    from streambench_spark.operators.graph import triangle_counts

    star = [(0, i) for i in range(1, 30)]
    edges = spark.createDataFrame(star + [(1, 2)], ["src", "dst"])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_weighted_sample_is_deterministic_and_weight_sensitive(spark):
    from streambench_spark.llm.sampling import weighted_topn_sample

    rows = [(i, 1000 if i < 10 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    s1 = sorted(r["doc_id"] for r in weighted_topn_sample(df, 20, "w").collect())
    s2 = sorted(r["doc_id"] for r in weighted_topn_sample(df, 20, "w").collect())
    assert s1 == s2  # pure function of the keys
    # weight-1000 keys (u^(1/1000) ~ 1) dominate weight-1 keys
    assert len([d for d in s1 if d < 10]) == 10
    # n >= rows returns everything
    assert weighted_topn_sample(df, 500, "w").count() == 200


def test_asof_cogrouped_agrees_with_builtin(spark):
    """The pandas-cogroup as-of twin must agree bit-for-bit with the
    sorted-union carry-forward on shared-lineage inputs (the exprId
    dedup trap: both sides derive from ONE parent frame)."""
    import datetime as dt

    from streambench_spark.operators.relational import (
        asof_join,
        asof_join_cogrouped,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(5):
        for i in range(8):
            rows.append((u, base + dt.timedelta(minutes=3 * i + u), 100 * u + i,
                         "q" if i % 2 == 0 else "p"))
    ev = spark.createDataFrame(rows, ["k", "ts", "eid", "side"])
    quotes = ev.filter(F.col("side") == "q").select(
        "k", "ts", F.col("eid").alias("qid"))
    probes = ev.filter(F.col("side") == "p").select(
        F.col("eid").alias("pid"), "k", "ts")
    a = asof_join(probes, quotes, "k", "ts", "ts", ["qid"]).select(
        "pid", "k", "qid")
    b = asof_join_cogrouped(probes, quotes, "k", "ts", "ts", ["qid"]).select(
        "pid", "k", "qid")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() == 20  # every probe has an earlier quote


@pytest.mark.parametrize("mode", ["md5", "xxhash64"])
def test_kmv_retained_merge_is_lossless(spark, mode):
    """Union of per-shard retained sets, re-topped to k, equals the
    whole-data sketch — KMV merge introduces NO approximation. The ONE
    home of this pin, parametrized over both hash modes (r08: the KMV
    family gained the hash_mode knob; DuckDB can't oracle xxhash64, so
    this property test is what stands behind that mode)."""
    from pyspark.sql import Window

    from streambench_spark.operators.aggregates import (
        kmv_estimate,
        kmv_retained,
    )

    df = spark.range(2000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    a = df.filter(F.col("v") < 1200)   # overlapping shards
    b = df.filter(F.col("v") >= 800)
    merged = (
        kmv_retained(a, ["g"], "v", 32, hash_mode=mode)
        .unionAll(kmv_retained(b, ["g"], "v", 32, hash_mode=mode))
        .select("g", "_h").distinct()
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("g").orderBy("_h")))
        .filter(F.col("_rn") <= 32)
        .select("g", "_h")
    )
    whole = kmv_retained(df, ["g"], "v", 32, hash_mode=mode)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    est = kmv_estimate(whole, ["g"], 32).first()
    assert est["n_kept"] == 32 and 1300 <= est["estimate"] <= 2700


@pytest.mark.parametrize("mode", ["md5", "xxhash64"])
def test_kmv_partial_path_identical_to_plain(spark, mode):
    """The map-side-partial KMV (narrow Arrow k-smallest per partition,
    then the relational merge) must return the IDENTICAL retained frame
    as the single distinct+window version — the merge is lossless by
    construction, in BOTH hash modes. Run over a multi-partition,
    multi-group frame with heavy duplication so per-partition heaps
    actually evict."""
    from streambench_spark.operators.aggregates import (
        kmv_retained,
        kmv_retained_partial,
    )

    df = (
        spark.range(0, 20000, 1, 8)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") % 700).alias("v"),  # duplicates across partitions
        )
    )
    plain = sorted(map(tuple, kmv_retained(
        df, ["g"], "v", 16, hash_mode=mode).collect()))
    partial = sorted(map(tuple, kmv_retained_partial(
        df, ["g"], "v", 16, hash_mode=mode).collect()))
    assert partial == plain and len(plain) == 3 * 16


def test_kmv_null_keys_and_values(spark):
    """NULL group keys form ONE group (not one state entry per NULL row
    in the partial path's per-task dict — the r08 review's unbounded
    state finding), NULL values are ignored like COUNT(DISTINCT), and
    the partial path still returns the identical retained frame."""
    from streambench_spark.operators.aggregates import (
        kmv_distinct,
        kmv_retained,
        kmv_retained_partial,
    )

    df = (
        spark.range(0, 4000, 1, 8)
        .select(
            F.when(F.col("id") % 3 == 0, None)
            .otherwise(F.col("id") % 2).alias("g"),
            F.when(F.col("id") % 5 == 0, None)
            .otherwise(F.col("id")).alias("v"),
        )
    )
    nkey = lambda t: tuple((x is None, x) for x in t)  # None sorts last
    plain = sorted(
        map(tuple, kmv_retained(df, ["g"], "v", 16).collect()), key=nkey
    )
    partial = sorted(
        map(tuple, kmv_retained_partial(df, ["g"], "v", 16).collect()),
        key=nkey,
    )
    assert partial == plain
    groups = {r[0] for r in plain}
    assert None in groups and len(groups) == 3  # NULL, 0, 1
    est = {
        r["g"]: r["estimate"]
        for r in kmv_distinct(df, ["g"], "v", 32).collect()
    }
    assert len(est) == 3 and all(v > 0 for v in est.values())


def test_kmv_rejects_k_below_two(spark):
    """k=1 makes the estimator identically zero — refuse loudly."""
    from streambench_spark.operators.aggregates import (
        kmv_retained,
        kmv_retained_partial,
    )

    df = spark.range(10).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_retained(df, ["g"], "v", 1)
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_retained_partial(df, ["g"], "v", 1)


def test_star_cc_matches_minlabel_on_random_graph(spark):
    """Large-star/small-star CC must produce the identical (node, comp)
    labeling as min-label propagation on a mixed graph (several blobs +
    isolated pairs), comp = component minimum in both."""
    import random

    from streambench_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rnd = random.Random(7)
    edges = []
    for blob in range(5):  # 5 dense-ish blobs of 20 nodes
        nodes = [blob * 100 + i for i in range(20)]
        for _ in range(40):
            edges.append((rnd.choice(nodes), rnd.choice(nodes)))
    edges += [(1000, 1001), (2000, 2001)]  # isolated pairs
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "src long, dst long"
    )
    plain = sorted(map(tuple, connected_components(df).collect()))
    star = sorted(map(tuple, connected_components_star(df).collect()))
    assert star == plain


def test_star_cc_converges_on_long_chain_where_minlabel_raises(spark):
    """A 120-node path has diameter 119: min-label at its default
    25-round budget must now RAISE (previously it returned a silently
    wrong labeling); the star variant converges inside its default
    budget and labels every node with the chain minimum."""
    import pytest

    from streambench_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain)
    labels = connected_components_star(chain).collect()
    assert len(labels) == 120
    assert all(r["comp"] == 0 for r in labels)


def test_cms_unseen_key_estimates_zero(spark):
    """Regression for the round-4 review find: the sketch frame is sparse,
    so probing a key absent from the build must left-join its empty cells
    back as 0 — the classic CMS estimate for an unseen key with any
    empty cell — not drop them and report an inflated min."""
    from streambench_spark.operators.sketches import (
        count_min_build, count_min_estimate,
    )

    build = spark.createDataFrame(
        [(k,) for k in ["a", "b", "c"] * 10], "key string"
    )
    sketch = count_min_build(build, "key", depth=4, width=512)
    probes = spark.createDataFrame(
        [("a",), ("never-seen-key",)], "key string"
    )
    est = {
        r["key"]: r["est"]
        for r in count_min_estimate(sketch, probes, "key", 4, 512).collect()
    }
    assert est["a"] == 10
    # width 512, 30 distinct cells max: an unseen key's 4 cells are
    # overwhelmingly empty -> min coalesces to 0, and the key MUST
    # appear in the output at all
    assert est["never-seen-key"] == 0


def test_asof_cogrouped_null_quote_fields_still_match(spark):
    """Regression for the round-4 review find: the cogrouped as-of twin
    detected unmatched probes via the FIRST quote payload column, so a
    matched quote with a NULL first field was silently dropped (and a
    NULL int field crashed the int64 cast). Must mirror the builtin's
    NULL-preserving semantics exactly."""
    from streambench_spark.operators.relational import (
        asof_join, asof_join_cogrouped,
    )

    quotes = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 20, None, None), (1, 30, 300, "c")],
        "k long, t long, px long, tag string",
    )
    probes = spark.createDataFrame(
        [(0, 1, 25), (1, 1, 35), (2, 1, 15), (3, 1, 5)],
        "pid long, k long, t long",
    )
    kw = dict(key="k", probe_ts="t", quote_ts="t", quote_cols=["px", "tag"])
    want = {
        r["pid"]: (r["px"], r["tag"])
        for r in asof_join(probes, quotes, **kw).collect()
    }
    got = {
        r["pid"]: (r["px"], r["tag"])
        for r in asof_join_cogrouped(probes, quotes, **kw).collect()
    }
    # probe@25 matches the all-NULL quote@20 and is NOT dropped;
    # probe@5 precedes every quote and IS dropped (both paths)
    assert want == {0: (None, None), 1: (300, "c"), 2: (100, "a")}
    assert got == want
