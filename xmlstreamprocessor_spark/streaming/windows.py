"""Streaming windowed aggregations with watermark-driven late-data policy.

Semantics match the batch twins in operators/temporal.py exactly (same
F.window / F.session_window expressions); tests assert stream == batch on
the replayed events table.  State size is bounded by the watermark: closed
windows are emitted (append mode) and their state dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from xmlstreamprocessor_spark.operators.registry import dec2


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec2("value")).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def rollup_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Chained minute->hour windowed aggregation in ONE streaming query
    (Spark's multiple-stateful-operator support): the hour level re-windows
    the minute level's WINDOW COLUMN — ``F.window(F.col("w1"), "1 hour")``
    — so it aggregates minute partials, never raw events, exactly like the
    batch cascade in ``temporal_rollup_multires``.  At scale the second
    operator's input is ~60x smaller than the stream; state for both
    levels is bounded by the same watermark."""
    minute = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute").alias("w1"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).alias("total_value"),
        )
    )
    return (
        minute.groupBy(F.window(F.col("w1"), "1 hour").alias("w2"))
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
        .select(
            F.date_format("w2.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "n_events",
            "total_value",
        )
    )
