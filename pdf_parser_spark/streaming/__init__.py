"""Structured Streaming adapter.

The reference is batch-only (SURVEY.md §2.10) so streaming is a thin layer:
the SAME extraction stage (operators.extract) applied over a readStream of
the pages layout, with per-micro-batch checkpoint rows.  Kept minimal by
design — resumability in batch mode comes from the checkpoint table, not from
streaming state.
"""

from pdf_parser_spark.streaming.pipeline import stream_extract

__all__ = ["stream_extract"]
