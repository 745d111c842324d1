"""Streaming deduplication.

``dropDuplicatesWithinWatermark`` keys state by the dedup columns and evicts
it once the watermark passes — bounded state for unbounded streams, the
streaming twin of the batch exact-dedup operator (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
