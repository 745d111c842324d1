"""Streaming sinks (the distributed analogue of the reference's typed-object
sink, Parser.cs:335-345, plus durability the reference never had).

Exactly-once file sinks in Structured Streaming come from the pairing of a
checkpoint location (offsets + commit log) with the sink's own transaction
log; both paths are therefore required arguments — a production stream
without a checkpoint silently reprocesses on restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    available_now: bool = False,
    output_mode: str = "append",
) -> StreamingQuery:
    """Durable parquet sink with exactly-once semantics.  ``available_now``
    drains everything currently readable and terminates — the batch-backfill
    mode; otherwise the query runs continuously."""
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def write_stream_foreach_batch(
    df: DataFrame,
    checkpoint: str,
    fn,
    available_now: bool = False,
) -> StreamingQuery:
    """foreachBatch escape hatch: ``fn(batch_df, batch_id)`` runs once per
    micro-batch with a *batch* DataFrame — the idiomatic route to sinks with
    no streaming writer (JDBC, merges).  fn must be idempotent on batch_id
    for exactly-once."""
    w = df.writeStream.foreachBatch(fn).option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
