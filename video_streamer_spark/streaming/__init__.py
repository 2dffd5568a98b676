"""Structured Streaming spine: sources, stateful aggregations, idempotent
sinks, and query-progress metrics — the reference's streaming identity
(GStreamer push pipeline, run.sh:53) on Spark's micro-batch model.
"""
