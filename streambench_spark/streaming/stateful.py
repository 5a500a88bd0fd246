"""Custom stateful streaming operators via ``applyInPandasWithState``
(T5 beyond the built-in state store: arbitrary per-key state with the
GroupState API — the Spark-idiomatic home for stateful logic the built-in
windowed/dedup operators can't express).

Scale posture: state lives in the executor state store partitioned by the
grouping key (same sharding as the built-in aggregates); each micro-batch
touches only the keys present in that batch, Arrow-batched per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def running_counts(
    stream: DataFrame, keys: list[str], out_schema: str
) -> DataFrame:
    """Per-key cumulative row count across micro-batches.

    Emits one row per (key, batch-with-arrivals) carrying the cumulative
    total so far — the running-counter shape the reference's Flink trigger
    keeps in ValueState (YahooBenchmark.scala:80-85). The closure is
    self-contained (no module globals) so executors need no package on
    their PYTHONPATH.
    """

    def _count(key, pdfs, state):
        import pandas as _pd

        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield _pd.DataFrame([{**dict(zip([f"k{i}" for i in range(len(key))], key)),
                              "n": total}]).rename(
            columns={f"k{i}": k for i, k in enumerate(keys)}
        )

    return stream.groupBy(*keys).applyInPandasWithState(
        _count,
        outputStructType=out_schema,
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
