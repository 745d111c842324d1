"""Streaming joins.

* stream-static: enrich a stream against a batch dimension — planned per
  micro-batch, so the static side broadcasts exactly like a batch join and
  the stream side never shuffles on the join key.
* stream-stream (interval): both sides buffered in watermarked state; the
  time-bound condition is what lets Spark evict state, so it is mandatory —
  an unbounded stream-stream join would grow state forever at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_stream_static(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static inner join: per-user event stream x static user segment
    dimension.  ``dim`` is re-read each micro-batch (picks up slowly-changing
    dimensions) and broadcast when small."""
    return events.join(F.broadcast(dim), "user_id")


def join_purchases_to_views(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same user's
    views in the preceding hour.  Watermarks bound both state stores; the
    interval predicate bounds how long a view is kept (1 h + delay).

    Output columns: user_id, purchase_id, view_id, gap_seconds."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "10 minutes")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias("gap_seconds"),
    )
