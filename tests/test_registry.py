"""Every registered query with an oracle must match DuckDB on sf0.001 —
this mirrors the driver's CORRECTNESS gate (row count + columns + values).
"""

from __future__ import annotations

import pytest

from streambench_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert_matches_oracle(df, duck, q.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()).issuperset(set(e.oracle_sql()))
