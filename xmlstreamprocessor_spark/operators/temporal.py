"""Temporal operators: as-of join, sessionization, tumbling/sliding/session
time windows (batch semantics identical to the Structured Streaming versions
in ``streaming/``).  The reference has no time semantics at all; these are
north-star extensions."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from xmlstreamprocessor_spark.operators.registry import (
    big,
    dec2,
    fmt_ts,
    money2,
    query,
    t,
)


@query(
    "asof_join_purchase_last_view",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           v.event_id AS view_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_join_purchase_last_view(spark, sf_dir):
    """AS-OF join (for each purchase, the most recent earlier view by the
    same user).  Spark has no ASOF primitive; the scalable formulation is
    union-the-streams + last(ignorenulls) over a user/time window — one
    shuffle on user_id, no per-user quadratic work, no Python.
    Ties (view.ts == purchase.ts at equal ts) resolve to the LATEST view,
    matching DuckDB ASOF (>=) semantics; within identical timestamps the
    higher event_id wins deterministically."""
    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("bigint").alias("view_id"),
        F.lit(1).alias("is_purchase"),
        F.col("event_id").alias("purchase_id"),
    )
    # views sort before purchases at the same ts (is_purchase asc) so an
    # equal-ts view is visible to the purchase row, matching ASOF >=.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "view_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        views.unionByName(purchases)
        .withColumn("last_view", F.last("view_id", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            "purchase_id",
            "user_id",
            fmt_ts("ts").alias("purchase_ts"),
            F.col("last_view").alias("view_id"),
        )
    )


@query(
    "asof_forward_view_next_purchase",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, 1 AS is_view, event_id AS view_id,
             NULL::BIGINT AS pid
      FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, ts, 0, NULL, event_id
      FROM events WHERE event_type = 'purchase'
    ), scanned AS (
      SELECT user_id, ts, is_view, view_id,
             last_value(CASE WHEN pid IS NOT NULL
                             THEN {'ts': ts, 'pid': pid} END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts DESC, is_view ASC, pid DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS nxt
      FROM u
    )
    SELECT view_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           CASE WHEN nxt IS NOT NULL
                 AND date_diff('second', ts, CAST(nxt.ts AS TIMESTAMP)) <= 86400
                THEN nxt.pid END AS purchase_id,
           CASE WHEN nxt IS NOT NULL
                 AND date_diff('second', ts, CAST(nxt.ts AS TIMESTAMP)) <= 86400
                THEN CAST(date_diff('second', ts, CAST(nxt.ts AS TIMESTAMP)) AS BIGINT)
                END AS wait_s
    FROM scanned WHERE is_view = 1
    """,
)
def asof_forward_view_next_purchase(spark, sf_dir):
    """FORWARD as-of join with tolerance (the other half of the as-of
    family next to asof_join_purchase_last_view): for every view, the
    EARLIEST purchase by the same user at ts >= view.ts, nulled past a
    24 h tolerance — the time-to-convert attachment a funnel pipeline
    computes per impression.

    Scalable formulation: union the two streams and scan them ONCE per
    user in REVERSE time order — ``last(purchase, ignorenulls)`` over the
    reversed prefix is exactly the next-upcoming purchase; one shuffle on
    user_id, no stream self-join, no per-user quadratic work.
    Determinism: at equal timestamps the purchase sorts before the view
    in the reversed scan (ASOF >= semantics: an equal-ts purchase is
    visible), and equal-ts purchases order by pid DESC so the LAST
    encountered — i.e. the lowest purchase_id — wins on both engines.
    Tolerance nulls the match but keeps the view row (left-join
    semantics, pandas ``merge_asof(tolerance=...)``)."""
    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts",
        F.lit(1).alias("is_view"),
        F.col("event_id").alias("view_id"),
        F.lit(None).cast("bigint").alias("pid"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.lit(0).alias("is_view"),
        F.lit(None).cast("bigint").alias("view_id"),
        F.col("event_id").alias("pid"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc("is_view"), F.desc("pid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.last(
        F.when(
            F.col("pid").isNotNull(), F.struct(F.col("ts"), F.col("pid"))
        ),
        ignorenulls=True,
    ).over(w)
    scanned = views.unionByName(purchases).withColumn("nxt", nxt)
    wait = F.col("nxt.ts").cast("long") - F.col("ts").cast("long")
    in_tol = F.col("nxt").isNotNull() & (wait <= 86400)
    return scanned.filter(F.col("is_view") == 1).select(
        "view_id",
        "user_id",
        fmt_ts("ts").alias("view_ts"),
        F.when(in_tol, F.col("nxt.pid")).alias("purchase_id"),
        F.when(in_tol, wait.cast("bigint")).alias("wait_s"),
    )


@query(
    "sessionize_events_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize_events_30m(spark, sf_dir):
    """Batch sessionization (30-min inactivity gap) via lag + running sum —
    one shuffle on user_id; the same semantics as session_window in
    streaming mode."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > 1800),
        1,
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w_run).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(fmt_ts("ts")).alias("session_start"),
        )
    )


@query(
    "window_tumbling_hourly_events",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def window_tumbling_hourly_events(spark, sf_dir):
    """Tumbling 1h windows — batch twin of the streaming tumbling agg
    (streaming/windows.py); F.window is the same expression readStream uses."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money2(F.sum(dec2("value"))).alias("total_value"),
        )
        .select(
            fmt_ts(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_sliding_1h_30m_events",
    oracle="""
    WITH slid AS (
      SELECT e.ts, e.value,
             time_bucket(INTERVAL 30 MINUTE, e.ts) - k.k * INTERVAL 30 MINUTE
               AS window_start
      FROM events e, (SELECT unnest(range(0, 2)) AS k) k
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM slid
    WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
    GROUP BY window_start
    """,
)
def window_sliding_1h_30m_events(spark, sf_dir):
    """Sliding windows (1h length, 30m slide): each event lands in 2
    overlapping windows.  F.window expands rows JVM-side."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            money2(F.sum(dec2("value"))).alias("total_value"),
        )
        .select(
            fmt_ts(F.col("w.start")).alias("window_start"),
            "n",
            "total_value",
        )
    )


@query(
    "window_session_10m_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts) >= 600000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def window_session_10m_events(spark, sf_dir):
    """session_window (10-min gap) per user — Spark's native session window;
    the oracle reconstructs the identical merge semantics relationally
    (a new session starts when the gap is >= the timeout; session end =
    last event + gap)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            fmt_ts(F.col("w.start")).alias("session_start"),
            fmt_ts(F.col("w.end")).alias("session_end"),
            "n_events",
        )
    )


@query(
    "temporal_rollup_multires",
    oracle="""
    WITH minute AS (
      SELECT date_trunc('minute', ts) AS b,
             count(*) AS n_events,
             sum(CAST(value AS DECIMAL(18,2))) AS total_value
      FROM events GROUP BY 1
    ), hour AS (
      SELECT date_trunc('hour', b) AS b,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             sum(total_value) AS total_value
      FROM minute GROUP BY 1
    ), day AS (
      SELECT date_trunc('day', b) AS b,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             sum(total_value) AS total_value
      FROM hour GROUP BY 1
    )
    SELECT 'minute' AS resolution, strftime(b, '%Y-%m-%d %H:%M:%S')
             AS bucket_start, n_events,
           round(CAST(total_value AS DOUBLE), 2) AS total_value FROM minute
    UNION ALL
    SELECT 'hour', strftime(b, '%Y-%m-%d %H:%M:%S'), n_events,
           round(CAST(total_value AS DOUBLE), 2)
    FROM hour
    UNION ALL
    SELECT 'day', strftime(b, '%Y-%m-%d %H:%M:%S'), n_events,
           round(CAST(total_value AS DOUBLE), 2)
    FROM day
    """,
)
def temporal_rollup_multires(spark, sf_dir):
    """Hypertable-style continuous aggregate: minute/hour/day rollups where
    each coarser level RE-AGGREGATES the finer level's partials (sum of
    sums), never rescanning raw events.  At 100 TB that hierarchy is the
    difference between one fact scan and three: the hour level reads ~60x
    fewer rows than raw, the day level ~1440x — and because sum/count are
    algebraic the result is bit-identical to aggregating raw each time
    (the oracle proves it by building the same cascade)."""
    e = t(spark, sf_dir, "events")
    minute = e.groupBy(F.date_trunc("minute", "ts").alias("b")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec2("value")).alias("total_value"),
    )
    hour = minute.groupBy(F.date_trunc("hour", "b").alias("b")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").alias("total_value"),
    )
    day = hour.groupBy(F.date_trunc("day", "b").alias("b")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").alias("total_value"),
    )

    def lvl(df, tag):
        return df.select(
            F.lit(tag).alias("resolution"),
            fmt_ts("b").alias("bucket_start"),
            "n_events",
            money2(F.col("total_value")).alias("total_value"),
        )

    return lvl(minute, "minute").unionAll(lvl(hour, "hour")).unionAll(
        lvl(day, "day")
    )


@query(
    "temporal_gapfill_locf",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             sum(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1
    ), spine AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ), j AS (
      SELECT s.event_type, s.h, hr.v
      FROM spine s LEFT JOIN hourly hr
        ON hr.event_type = s.event_type AND hr.h = s.h
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           (v IS NULL) AS gap_filled,
           round(CAST(last_value(v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
             AS value_filled
    FROM j
    """,
)
def temporal_gapfill_locf(spark, sf_dir):
    """Gap-fill + last-observation-carried-forward: a dense hourly spine
    per event_type (sequence+explode — generated on executors, never a
    driver loop), left-joined to the sparse aggregate, then LOCF as a
    running last(ignorenulls) window.  Scale: the spine is O(key_count x
    hours) rows of two columns; the window sorts within key only — the
    same single-shuffle profile as any per-key sessionization."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    hourly = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(dec2("value")).alias("v")
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    j = spine.join(hourly, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        fmt_ts("h").alias("hour_start"),
        F.col("v").isNull().alias("gap_filled"),
        money2(F.last("v", ignorenulls=True).over(w)).alias("value_filled"),
    )


@query(
    "temporal_ewma_per_user",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 50
    ), walk AS (
      SELECT user_id, event_id, rn, value, value AS ewma
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.rn, e.value,
             CAST(0.2 AS DOUBLE) * e.value + CAST(0.8 AS DOUBLE) * w.ewma
      FROM ev e JOIN walk w ON e.user_id = w.user_id AND e.rn = w.rn + 1
    )
    SELECT user_id, event_id, round(ewma, 6) AS ewma
    FROM walk ORDER BY user_id, rn
    """,
)
def temporal_ewma_per_user(spark, sf_dir):
    """Exponentially weighted moving average of event values per user
    (alpha=0.2) — the classic sequential recurrence no window frame can
    express (each output depends on ALL preceding values with decaying
    weights).  Runs as an Arrow grouped-map kernel: one ordered pass per
    user, O(1) state, parallel across users — the oracle proves the same
    recurrence with a recursive CTE.  Scale: the only shuffle is the
    groupBy(user_id); a hot user is bounded by per-user history length,
    not corpus size."""
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ewma", DoubleType()),
        ]
    )

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        s = None
        out = []
        for x in pdf["value"]:
            x = float(x)
            s = x if s is None else 0.2 * x + 0.8 * s
            out.append(round(s, 6))
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "ewma": out}
        )

    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        e.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_ewma, schema=out_schema)
        .orderBy("user_id", "event_id")
    )


@query(
    "temporal_gapfill_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             sum(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1
    ), spine AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ), j AS (
      SELECT s.event_type, s.h, hr.v
      FROM spine s LEFT JOIN hourly hr
        ON hr.event_type = s.event_type AND hr.h = s.h
    ), ctx AS (
      SELECT event_type, h, v,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
               OVER wp AS pt,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
               OVER wf AS nt
      FROM j
      WINDOW wp AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           (v IS NULL) AS gap_filled,
           round(CASE
             WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
             WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
             WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
             ELSE CAST(pv AS DOUBLE)
                  + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                    * (date_diff('second', pt, h) * 1.0
                       / date_diff('second', pt, nt))
           END, 6) AS value_interp
    FROM ctx
    """,
)
def temporal_gapfill_interpolate(spark, sf_dir):
    """Gap-fill with LINEAR INTERPOLATION between the surrounding
    observations (LOCF's smooth sibling): two mirrored ignore-nulls
    windows carry the previous/next known (time, value), the fill is the
    standard lerp.  Catalyst shares one sort+shuffle for both window
    frames (same partitioning/ordering).  Endpoints clamp to the nearest
    known value."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    hourly = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(dec2("value")).alias("v")
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    j = spine.join(hourly, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_t = F.when(F.col("v").isNotNull(), F.col("h"))
    ctx = j.select(
        "event_type",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(known_t, ignorenulls=True).over(wp).alias("pt"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(known_t, ignorenulls=True).over(wf).alias("nt"),
    )
    frac = (
        (F.unix_timestamp("h") - F.unix_timestamp("pt")) * F.lit(1.0)
        / (F.unix_timestamp("nt") - F.unix_timestamp("pt"))
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v").cast("double"))
        .when(F.col("pv").isNull(), F.col("nv").cast("double"))
        .when(F.col("nv").isNull(), F.col("pv").cast("double"))
        .otherwise(
            F.col("pv").cast("double")
            + (F.col("nv").cast("double") - F.col("pv").cast("double")) * frac
        )
    )
    return ctx.select(
        "event_type",
        fmt_ts("h").alias("hour_start"),
        F.col("v").isNull().alias("gap_filled"),
        F.round(interp, 6).alias("value_interp"),
    )


# ---------------------------------------------------------------------------
# bucketized interval (range) join: points-in-intervals WITHOUT a
# broadcast-nested-loop join.  Spark has no range-join primitive; a naive
# `e.ts BETWEEN w.lo AND w.hi` join compiles to BNLJ — a cluster-melter
# when the interval side outgrows the broadcast threshold.  The scalable
# rewrite (the same one Databricks' range-join hint performs) chunks time
# into fixed buckets no longer than the shortest interval: each interval
# explodes into the <= 3 buckets it covers, each point maps to exactly
# one bucket, and the join becomes a plain hash EQUI-join on the bucket
# with the containment predicate left as a residual filter.
# ---------------------------------------------------------------------------

_IVL_SPACING_S = 21600  # one window every 6 h
_IVL_LEN_S = 5400  # 90 min long
_IVL_BUCKET_S = 1800  # bucket <= interval length; aligned with both
_IVL_N = 28  # 7 days of windows


@query(
    "interval_join_bucketized_incidents",
    oracle=f"""
    WITH b AS (
      SELECT CAST(floor(min(epoch(ts)) / 3600) * 3600 AS BIGINT) AS t0
      FROM events
    ), w AS (
      SELECT g.k,
             b.t0 + g.k * {_IVL_SPACING_S} AS start_s,
             b.t0 + g.k * {_IVL_SPACING_S} + {_IVL_LEN_S} AS end_s
      FROM (SELECT unnest(generate_series(0, {_IVL_N - 1})) AS k) g, b
    ), j AS (
      SELECT w.k, w.start_s, e.user_id
      FROM w LEFT JOIN events e
        ON epoch(e.ts) >= w.start_s AND epoch(e.ts) < w.end_s
    )
    SELECT k AS window_id,
           start_s AS window_start_s,
           count(user_id) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM j GROUP BY k, start_s
    ORDER BY window_id
    """,
)
def interval_join_bucketized_incidents(spark, sf_dir):
    """Count events and distinct users inside each of 28 deterministic
    90-minute "incident windows" (every 6 h from the hour-aligned corpus
    start) — a point-in-interval join executed as a bucketized EQUI-join.

    Plan: intervals explode into their 3 covered 30-min buckets; events
    compute their single bucket in the scan stage; the join is a hash
    equi-join on the bucket with containment as a residual predicate —
    shuffle partitions by bucket on BOTH sides, so it scales to an
    interval table of any size (no broadcast requirement, no BNLJ, no
    cartesian).  Windows are disjoint and bucket-aligned, so no event
    matches twice and no dedup pass is needed.  The DuckDB oracle states
    the same join naively — legal at oracle scale, the thing this rewrite
    exists to avoid at 100 TB."""
    e = t(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").alias("es"), "user_id"
    )
    t0 = e.agg(
        (F.floor(F.min("es") / 3600) * 3600).cast("bigint").alias("t0")
    )
    w = (
        t0.select(
            F.explode(F.sequence(F.lit(0), F.lit(_IVL_N - 1))).alias("k"), "t0"
        )
        .select(
            F.col("k").cast("bigint").alias("k"),
            (F.col("t0") + F.col("k") * _IVL_SPACING_S).alias("start_s"),
            (F.col("t0") + F.col("k") * _IVL_SPACING_S + _IVL_LEN_S).alias(
                "end_s"
            ),
        )
    )
    wb = w.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("start_s") / _IVL_BUCKET_S),
                F.floor((F.col("end_s") - 1) / _IVL_BUCKET_S),
            )
        ),
    )
    eb = e.withColumn("bucket", F.floor(F.col("es") / _IVL_BUCKET_S))
    j = eb.join(
        wb,
        (eb["bucket"] == wb["bucket"])
        & (eb["es"] >= wb["start_s"])
        & (eb["es"] < wb["end_s"]),
        "inner",
    ).select("k", "start_s", "user_id")
    agg = j.groupBy("k", "start_s").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.countDistinct("user_id").cast("bigint").alias("n_us"),
    )
    return (
        w.select("k", "start_s")
        .join(agg, ["k", "start_s"], "left")
        .select(
            F.col("k").alias("window_id"),
            F.col("start_s").alias("window_start_s"),
            F.coalesce(F.col("n_ev"), F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(F.col("n_us"), F.lit(0)).cast("bigint").alias("n_users"),
        )
        .orderBy("window_id")
    )


@query(
    "temporal_seasonality_dow_hour",
    oracle="""
    WITH keyed AS (
      SELECT CAST((floor(floor(epoch(ts)) / 86400) + 4) % 7 AS BIGINT) AS dow,
             CAST(floor(floor(epoch(ts)) % 86400 / 3600) AS BIGINT) AS hour,
             value
      FROM events
    )
    SELECT dow, hour,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value
    FROM keyed
    GROUP BY dow, hour
    ORDER BY dow, hour
    """,
)
def temporal_seasonality_dow_hour(spark, sf_dir):
    """Seasonality heatmap: event count and value by (day-of-week, hour)
    — the weekly activity fingerprint behind load planning and anomaly
    baselines.  Day-of-week computes from epoch days with the explicit
    1970-01-01-was-Thursday formula ((days + 4) % 7, 0 = Sunday) instead
    of engine dayofweek() builtins, whose numbering conventions differ
    (Spark 1=Sunday, DuckDB 0=Sunday) — the formula is identical integer
    arithmetic on both sides.

    Scale: a pure scan-stage projection into a 7x24-key aggregate —
    map-side combine collapses everything before one tiny shuffle."""
    e = t(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    keyed = e.select(
        ((F.floor(es / 86400) + 4) % 7).cast("bigint").alias("dow"),
        F.floor(es % 86400 / 3600).cast("bigint").alias("hour"),
        "value",
    )
    return (
        keyed.groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money2(F.sum(dec2("value"))).alias("total_value"),
        )
        .orderBy("dow", "hour")
    )


@query(
    "window_sliding_24h_distinct_users",
    oracle="""
    WITH hu AS (
      SELECT DISTINCT CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS h,
                      user_id
      FROM events WHERE user_id IS NOT NULL
    ), hours AS (SELECT DISTINCT h FROM hu)
    SELECT hours.h * 3600 AS hour_epoch_s,
           CAST(count(DISTINCT hu.user_id) AS BIGINT) AS distinct_users_24h
    FROM hours JOIN hu ON hu.h BETWEEN hours.h - 23 AND hours.h
    GROUP BY hours.h
    ORDER BY hour_epoch_s
    """,
)
def window_sliding_24h_distinct_users(spark, sf_dir):
    """Trailing-24h distinct active users per hour — the classic sliding
    COUNT(DISTINCT) that resists both plain windows (no DISTINCT over a
    RANGE frame) and range joins (Spark executes a BETWEEN join as a
    broadcast nested loop).

    Spark-first shape: (1) pre-dedup raw events to (hour, user) pairs —
    at 100 TB this is the big shrink, |users| x |active hours| rows
    instead of |events|; (2) fan each pair out to the 24 target hours it
    contributes to with a constant-width ``sequence``+``explode`` (bounded
    24x blow-up of the ALREADY-deduped set); (3) dedup (target, user) and
    count per target — all equi-key shuffles with map-side combine, no
    non-equi join anywhere; (4) semi-join to hours that actually have
    events so the report has no empty-hour rows."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    hu = e.select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"),
        "user_id",
    ).distinct()
    contrib = hu.select(
        F.explode(F.sequence(F.col("h"), F.col("h") + 23)).alias("th"),
        "user_id",
    ).distinct()
    hours = hu.select(F.col("h").alias("th")).distinct()
    return (
        contrib.join(hours, "th", "left_semi")
        .groupBy("th")
        .agg(F.count(F.lit(1)).cast("bigint").alias("distinct_users_24h"))
        .select(
            (F.col("th") * 3600).cast("bigint").alias("hour_epoch_s"),
            "distinct_users_24h",
        )
        .orderBy("hour_epoch_s")
    )
