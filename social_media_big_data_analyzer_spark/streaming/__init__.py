"""Structured Streaming surface (SURVEY §2.2 C3, C32-C37; §2.1 R1, R19,
R20, R34): micro-batch file source, watermarked window aggregations,
stateful dedup, and the reference's paginated rate-limited ingest loop
re-expressed as a bounded streaming query.
"""

from .jobs import run_streaming_dedup_counts, run_streaming_tumbling
