"""Structured Streaming half of the engine: streaming YSB query builders,
watermark/trigger/output-mode policy (SURVEY.md §2.7), throughput
listener (M1/A9), and run helpers."""
