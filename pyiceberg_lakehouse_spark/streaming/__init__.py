"""Structured Streaming coverage: windowed aggregation, watermark dedup."""
