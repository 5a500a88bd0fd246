"""Shared fixtures: one local SparkSession per test session, plus a
DuckDB-oracle comparator that mimics the driver's verify (row count +
column names + order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from streambench_spark.schemas import TESTDATA_TABLES  # noqa: E402
from streambench_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="streambench-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 9dp matches the driver gate's rounding exactly (VERDICT r10
        # item 4 — 6dp was an acceptable-but-weaker second gate)
        return round(v, 9)
    return v


def assert_matches_oracle(spark_df, duck_con, sql):
    """Driver-verify mimic: same columns (sorted by name), same multiset of
    rows (floats rounded)."""
    sdf = spark_df.toPandas()
    ddf = duck_con.sql(sql).df()
    assert sorted(sdf.columns) == sorted(
        ddf.columns
    ), f"columns differ: {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    cols = sorted(sdf.columns)
    assert len(sdf) == len(ddf), f"row count {len(sdf)} vs {len(ddf)}"
    srows = sorted(
        [tuple(_norm(v) for v in row) for row in sdf[cols].itertuples(index=False)]
    )
    drows = sorted(
        [tuple(_norm(v) for v in row) for row in ddf[cols].itertuples(index=False)]
    )
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ]
    assert srows == drows, f"value mismatch; first diffs: {mismatches[:5]}"
