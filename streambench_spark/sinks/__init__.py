"""Sinks (SURVEY.md §2.1 S2/S3/S8/S9/S10): console/noop/memory/parquet
writers, a latency-marking foreachBatch sink, and gated Kafka IO."""
