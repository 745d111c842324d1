"""Generalized as-of (nearest-event) join.

Spark has no ASOF primitive; the scalable formulation used here is
union-the-streams + last/first(ignorenulls) over a (by, time) window:

* one shuffle on the ``by`` key (both inputs together), never a per-row
  range probe or a broadcast of the full right side;
* per-key state inside the window is ONE packed struct (the candidate
  match), so skewed keys stay map-side-mergeable;
* ties at equal timestamps resolve to the right-side row (DuckDB
  ``ASOF >=`` semantics, pandas ``merge_asof(allow_exact_matches=True)``).

``direction``:
* ``"backward"`` — most recent right row with ``right.ts <= left.ts``;
* ``"forward"`` — earliest right row with ``right.ts >= left.ts``.

``tolerance_seconds`` nulls out matches farther than the bound (pandas
``tolerance=``), keeping the left row (left join semantics).

The oracle-paired query ``asof_join_purchase_last_view``
(operators/temporal.py) is this plan specialized by hand; tests compare
this general operator against ``pandas.merge_asof`` on the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the nearest right row per ``direction``.

    Returns all left columns plus ``<col><suffix>`` for each of
    ``right_cols`` (default: every non-key right column) and
    ``<on><suffix>`` (the matched right timestamp, null when no match or
    out of tolerance).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    keys = ([by] if by else []) + [on]

    packed = F.struct(F.col(on).alias(on), *[F.col(c) for c in right_cols])
    r = right.select(
        *keys,
        F.lit(0).alias("__is_left"),
        packed.alias("__cand"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l_side = left.select(
        *keys,
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__cand"].dataType).alias("__cand"),
        *[c for c in left.columns if c not in keys],
    )

    w = Window.partitionBy(*([by] if by else [F.lit(1)]))
    if direction == "backward":
        # right rows sort before left at equal ts -> exact matches visible;
        # struct-ordered __cand tiebreak makes duplicate right timestamps
        # resolve deterministically (highest candidate wins)
        w = w.orderBy(
            F.col(on).asc(), F.col("__is_left").asc(), F.col("__cand").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last("__cand", ignorenulls=True)
    else:
        w = w.orderBy(
            F.col(on).asc(), F.col("__is_left").desc(), F.col("__cand").desc()
        ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first("__cand", ignorenulls=True)

    out = (
        r.unionByName(l_side)
        .withColumn("__m", pick.over(w))
        .filter(F.col("__is_left") == 1)
    )
    matched_ts = F.col("__m")[on]
    if tolerance_seconds is not None:
        delta = F.abs(
            F.unix_micros(F.col(on)) - F.unix_micros(matched_ts)
        ) / 1_000_000
        out = out.withColumn(
            "__m",
            F.when(delta <= F.lit(tolerance_seconds), F.col("__m")),
        )
    return out.select(
        *keys,
        *[c for c in left.columns if c not in keys],
        F.col("__m")[on].alias(f"{on}{suffix}"),
        *[F.col("__m")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
