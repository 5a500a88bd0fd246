"""Sources: synthetic generators (S1/S6), file replay (S7), and streaming
readers over the testdata tables. Kafka paths (S2-S5) live in
streambench_spark.sinks.kafka and are gated on broker availability."""
