"""Structured Streaming operators: windowed aggs, streaming dedup, stateful ops."""
