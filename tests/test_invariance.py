"""Partition-invariance: results must be bit-identical across different
parallelism settings — the property that makes the integer-cents /
portable-hash / exact-percentile engineering hold on a real cluster,
where partition counts differ from the test session's."""

from __future__ import annotations

import pytest

from streambench_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR

# float- or order-sensitive representatives from each family
QUERIES = [
    "global_percentiles",       # exact percentile interpolation
    "grouped_percentiles",
    "tfidf_top_terms",          # ranking with tie-breaks
    "embedding_topk_cosine",    # float matmul + rounding
    "neardup_embedding_lsh",    # banded candidates + distinct
    "tpch_q1_pricing_summary",  # integer-cents sums
    "hypertable_rollup",        # cascade re-aggregation
    "sequence_packing",         # prefix-sum fold
]


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_parallelism(spark, name):
    def run(parts):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            return sorted(tuple(r) for r in df.collect())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    assert run(1) == run(32)


def test_repartition_for_compute_gates_on_width(spark):
    """Narrow plans widen to the target; already-wide plans are untouched
    (no gratuitous full-corpus shuffle on a many-split source)."""
    from streambench_spark.catalog import repartition_for_compute

    narrow = spark.range(0, 100, 1, 1)
    widened = repartition_for_compute(narrow, 8)
    assert widened.rdd.getNumPartitions() == 8

    wide = spark.range(0, 100, 1, 16)
    same = repartition_for_compute(wide, 8)
    assert same is wide  # identity: no shuffle inserted


def test_dataset_shuffle_order_invariant_and_dense(spark):
    """The epoch-shuffle order is a pure function of (key, seed): the
    same bijection 0..N-1 regardless of input partitioning."""
    from streambench_spark.catalog import load_table
    from streambench_spark.llm.sampling import dataset_shuffle

    docs = load_table(spark, SF_DIR, "documents")

    def run(parts):
        out = dataset_shuffle(docs.repartition(parts))
        return sorted((r["doc_id"], r["shuffle_pos"]) for r in out.collect())

    a, b = run(1), run(13)
    assert a == b
    positions = [p for _, p in a]
    assert sorted(positions) == list(range(len(positions)))  # dense bijection
