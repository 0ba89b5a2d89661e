"""Streaming deduplication — exact dedup as a continuous operator.

At ingest time (the 100 TB pipeline's front door), dedup runs on the
stream, not as a batch afterthought: ``dropDuplicatesWithinWatermark`` on
the content hash keeps state bounded by the watermark instead of growing
forever, which is the only viable shape for an unbounded feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["stream_dedup_exact"]


def stream_dedup_exact(
    docs_stream: DataFrame,
    ts_col: str = "ts",
    content_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first occurrence of each content hash within the watermark
    window. ``docs_stream`` must be a streaming DataFrame with an event-time
    column; duplicates arriving later than the watermark are the documented
    trade (bounded state) and are caught by the batch ``dedup_exact`` pass.
    """
    hashed = docs_stream.withColumn("content_hash", F.sha2(F.col(content_col), 256))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
