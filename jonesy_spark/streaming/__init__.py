"""Structured Streaming variants of the incremental (watermark) surface."""
