"""Focused pins for the r15 optimization-round internals changes:

- catalog.load_table's schema/DataFrame memo must be METADATA caching
  only: a rewritten parquet file (new mtime/size) must MISS the memo and
  the new rows must be visible, while an unchanged file returns the
  memoized plan object (the fixed-overhead win).
- the k-means argmin rewrite (row_number window -> min(struct(dist, c))
  hash aggregate) relies on lexicographic struct order being exactly the
  window's ORDER BY dist ASC, c ASC; pinned on a frame with exact
  distance ties so the tie-break can never silently flip.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from streambench_spark.catalog import load_table


def test_load_table_memo_invalidates_on_rewrite(spark, tmp_path):
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "documents.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a", "b"], pa.string())}),
        path,
    )
    first = load_table(spark, sf_dir, "documents")
    assert {r["doc_id"] for r in first.collect()} == {1, 2}

    # unchanged file: the memo returns the SAME immutable plan object
    assert load_table(spark, sf_dir, "documents") is first

    # rewrite (different rows => different size, fresh mtime): the
    # (path, mtime_ns, size) key must miss and the new rows must be
    # what executions see — the memo is plan caching, never row caching
    pq.write_table(
        pa.table({"doc_id": pa.array([7, 8, 9], pa.int64()),
                  "text": pa.array(["x", "y", "z"], pa.string())}),
        path,
    )
    second = load_table(spark, sf_dir, "documents")
    assert second is not first
    assert {r["doc_id"] for r in second.collect()} == {7, 8, 9}


def test_kmeans_argmin_struct_equals_window(spark):
    """min(struct(dist, c)) == the ORDER BY dist ASC, c ASC winner,
    including EXACT ties on dist (tie-break falls to the centroid id)."""
    rows = [
        # vec 1: exact tie between centroids "b" and "a" -> "a" wins
        (1, "b", 1.0), (1, "a", 1.0), (1, "c", 2.0),
        # vec 2: plain minimum
        (2, "c", 0.25), (2, "a", 0.5), (2, "b", 0.75),
        # vec 3: three-way tie -> lexicographically smallest id
        (3, "c", 4.0), (3, "b", 4.0), (3, "a", 4.0),
    ]
    d = spark.createDataFrame(rows, "vec_id long, c string, dist double")

    agg = (
        d.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "c")).alias("_best"))
        .select("vec_id", F.col("_best.c").alias("c"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("c").asc()
    )
    win = (
        d.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("vec_id", "c")
    )
    got_agg = {(r["vec_id"], r["c"]) for r in agg.collect()}
    got_win = {(r["vec_id"], r["c"]) for r in win.collect()}
    assert got_agg == got_win == {(1, "a"), (2, "c"), (3, "a")}
