"""Structured Streaming layer.

The reference has no true streams (SURVEY.md §2.8) — its streaming-shaped
behaviors are 5-minute micro-batch tasks and Iceberg snapshot appends that
become visible on refresh.  This package expresses those Spark-first:
file/snapshot sources → watermark-bounded transformations → idempotent
micro-batch sinks, plus the stream operators a training-data pipeline
needs (windowed rollups, in-stream dedup).
"""
