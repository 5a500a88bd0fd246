"""streambench_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of lsds/StreamBench (the Yahoo Streaming
Benchmark harness), re-expressed Spark-first, plus large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis).

Design stance (see SURVEY.md §7):
- Declarative DataFrame/SQL plans; Catalyst does pushdown/pruning/join
  selection. No custom Catalyst rules are required for the reference's
  operator semantics (SURVEY.md §4.1).
- Structured Streaming for the streaming half; batch and streaming share
  one expression tree per query.
- Python UDFs only where built-ins genuinely can't express the semantics,
  and then Arrow-vectorized (pandas_udf / mapInPandas).
"""

from streambench_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
