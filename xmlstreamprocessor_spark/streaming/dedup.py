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


def dedup_kafka_offsets(raw: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Rebalance guard for the Kafka seam: drop re-delivered records by
    their (topic, partition, offset) identity before any stateful operator.

    What real-Kafka semantics this does and does NOT cover: Spark's Kafka
    source tracks offsets in the checkpoint, so a plain kill/restart is
    already exactly-once — but a consumer-group REBALANCE, a
    ``failOnDataLoss=false`` gap re-read, or an upstream producer retry can
    hand the SAME (topic, partition, offset) to two micro-batches, and an
    out-of-order fetch can deliver a later segment before an earlier one.
    Keying dedup state on the offset triple (never the payload — two
    business events may be byte-identical) makes every downstream stateful
    op (sessionizer, packer, windowed aggs) see each record once.  State is
    evicted once the record's broker timestamp falls behind the watermark,
    so memory is bounded by redelivery horizon, not stream length; a
    redelivery arriving LATER than ``watermark`` (e.g. a multi-hour
    partition replay) is out of contract and must be handled by an
    idempotent sink instead.  Broker-side transactions/read_committed
    isolation are likewise out of scope — this is consumer-side hygiene."""
    return raw.withWatermark("timestamp", watermark).dropDuplicatesWithinWatermark(
        ["topic", "partition", "offset"]
    )
