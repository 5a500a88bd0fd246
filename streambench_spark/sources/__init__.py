"""Sources: synthetic generators (S1/S6), file replay (S7), streaming
readers over the testdata tables, and Kafka sources (S4 batch read-back +
streaming with backpressure) in ``sources.kafka``; Kafka sinks (S2/S3)
live in ``sinks.sinks``. All Kafka paths are gated on broker
availability."""
