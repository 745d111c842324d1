"""Streaming end-to-end training-data pipeline: the Structured Streaming
twin of ``operators/packing.pipeline_dedup_mix_pack``.

Stages, all in ONE streaming query:

1. **dedup** — stream-static LEFT SEMI join against the keeper set (one
   doc per normalized-text fingerprint).  The keeper index is built
   batch-side and refreshed out-of-band, the production shape for exact
   dedup at 100 TB: the stream never holds fingerprint state, so state
   size is zero regardless of corpus size.  (For purely in-stream dedup
   Spark offers ``dropDuplicatesWithinWatermark`` — see
   ``streaming/dedup.py`` — with state bounded by the watermark horizon.)
2. **mix** — the same deterministic md5-rate predicate as the batch
   operator: stateless, zero-shuffle.
3. **pack** — the greedy stateful packer (O(1) state per shard).

Because every stage is deterministic and the kernel is state-carry
associative, draining any file split yields byte-identical output to the
batch twin — asserted exactly in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from xmlstreamprocessor_spark.streaming.packer import pack_stream_stateful

_TOK_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def keeper_set(docs_batch: DataFrame) -> DataFrame:
    """One doc_id per normalized-text fingerprint (min wins) — the static
    dedup index the stream joins against."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        docs_batch.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


def mix_predicate(rates: dict[str, int] | None = None, default_rate: int = 100):
    """Deterministic per-language keep predicate (bucket < rate of 1000)."""
    rates = rates if rates is not None else {
        "en": 1000, "de": 500, "fr": 500, "es": 250, "zh": 250
    }
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    rate = F.lit(default_rate)
    for k, v in reversed(rates.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return bucket < rate


def pipeline_stream_dedup_mix_pack(
    docs_stream: DataFrame,
    keepers: DataFrame,
    cap: int = 2048,
    shard_docs: int = 100,
) -> DataFrame:
    """Compose dedup (stream-static semi join) -> mix (predicate) -> pack
    (stateful) over a streaming documents DataFrame."""
    kept = docs_stream.join(F.broadcast(keepers), "doc_id", "left_semi")
    mixed = kept.filter(mix_predicate()).select(
        (F.col("doc_id") / shard_docs).cast("bigint").alias("shard"),
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_TOK_RE)).cast("bigint").alias("n_tokens"),
    )
    return pack_stream_stateful(mixed, cap=cap)
