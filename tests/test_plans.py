"""Plan-shape assertions: the scale claims in PLANS.md/SCALE.md as
mechanical checks — pushdown reaches the scan, dims broadcast, shuffle
counts don't regress. Formatted-plan text is stable enough for these
coarse invariants (counts and node names, not layout)."""

from __future__ import annotations

import re

from streambench_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR


def _plan(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    return spark._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_ysb_plan_broadcast_and_single_shuffle(spark):
    plan = _plan(spark, "ysb")
    assert "BroadcastHashJoin" in plan           # dim side broadcast
    assert "SortMergeJoin" not in plan           # fact never shuffles to join
    # exactly one shuffle: the (window, segment) aggregate
    assert plan.count("Exchange (") - plan.count("BroadcastExchange (") == 1
    # filter + projection reach the fact scan
    assert "PushedFilters: [" in plan
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert "EqualTo(event_type,view)" in m.group(1)


def test_tpch_q6_pushdown_and_pruning(spark):
    plan = _plan(spark, "tpch_q6_forecast_revenue")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThanOrEqual(l_shipdate" in m.group(1)
    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}
    assert "Join" not in plan


def test_chunk_docs_no_key_shuffle(spark):
    plan = _plan(spark, "chunk_docs")
    # only the single-file round-robin repartition; no hash/range exchange
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Generate" in plan


def test_tpch_q5_all_dims_broadcast(spark):
    plan = _plan(spark, "tpch_q5_local_supplier")
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 5
    assert "SortMergeJoin" not in plan
    # lineitem shuffles only at the final groupBy(n_name)
    assert plan.count("Arguments: hashpartitioning") == 1
