"""Window / analytic operators (SURVEY.md §2B: ranking, analytic functions,
row/range frames, top-k per group).  ABSENT from the reference; standard
Spark Window API throughout — shuffles once on the partition key and sorts
within partitions, which is the optimal distributed plan for these."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from xmlstreamprocessor_spark.operators.registry import (
    avg6,
    big,
    dec2,
    fmt_d,
    money2,
    query,
    t,
)


@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_orders_per_customer(spark, sf_dir):
    """Top-K per group via row_number — the scalable alternative to
    groupBy+collect_list+slice (never materializes the full group)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", big(F.row_number().over(w)))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    """,
)
def window_rank_dense_ntile(spark, sf_dir):
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        big(F.rank().over(w)).alias("rnk"),
        big(F.dense_rank().over(w)).alias("drnk"),
        big(F.ntile(4).over(w)).alias("quartile"),
    )


@query(
    "window_running_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE), 2) AS running_total
    FROM orders
    """,
)
def window_running_total_per_customer(spark, sf_dir):
    """Cumulative sum with a ROWS frame; decimal accumulation keeps the
    running values exact (and therefore engine-independent)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        money2(F.sum(dec2("o_totalprice")).over(w)).alias("running_total"),
    )


@query(
    "window_lag_lead_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT)  AS days_since_prev,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_orderkey
    FROM orders
    """,
)
def window_lag_lead_order_gaps(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_date = F.lag("o_orderdate").over(w)
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        fmt_d("o_orderdate").alias("orderdate"),
        F.datediff(F.col("o_orderdate").cast("date"), prev_date.cast("date"))
        .cast("bigint")
        .alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "window_moving_avg_rows_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER w AS DOUBLE)
                 / count(*) OVER w, 6) AS moving_avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg_rows_frame(spark, sf_dir):
    """3-row moving average; built as exact-sum/count so both engines agree."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        avg6(F.sum(dec2("o_totalprice")).over(w), F.count(F.lit(1)).over(w)).alias(
            "moving_avg3"
        ),
    )


@query(
    "window_range_frame_value_band",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           count(*) OVER (PARTITION BY l_orderkey ORDER BY l_quantity
                          RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
             AS n_within_5qty
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def window_range_frame_value_band(spark, sf_dir):
    """RANGE frame over a value axis (not rows)."""
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_quantity")
        .rangeBetween(-5, 5)
    )
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.count(F.lit(1)).over(w).alias("n_within_5qty"),
        )
    )


@query(
    "window_first_last_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_value(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w_full).alias("last_order"),
        )
        .distinct()
    )


@query(
    "analytic_funnel_view_click_purchase",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    )
    SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
           count(CASE WHEN t_view < t_click THEN 1 END) AS n_view_click,
           count(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 END)
             AS n_full_funnel
    FROM stages
    """,
)
def analytic_funnel_view_click_purchase(spark, sf_dir):
    """Ordered conversion funnel (view -> click -> purchase) via conditional
    min-timestamps per user.  Scale: one shuffle on user_id with map-side
    partial mins; the final count is a scalar — no window, no self-join
    (the naive N-way self-join on a 100 TB events table is the anti-pattern
    this replaces)."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    stage = lambda s: F.min(F.when(F.col("event_type") == s, F.col("ts")))
    stages = e.groupBy("user_id").agg(
        stage("view").alias("t_view"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    cnt = lambda c: F.count(F.when(c, F.lit(1)))
    return stages.agg(
        cnt(F.col("t_view").isNotNull()).alias("n_view"),
        cnt(F.col("t_view") < F.col("t_click")).alias("n_view_click"),
        cnt(
            (F.col("t_view") < F.col("t_click"))
            & (F.col("t_click") < F.col("t_purchase"))
        ).alias("n_full_funnel"),
    )


@query(
    "analytic_weekly_retention_cohorts",
    oracle="""
    WITH firstw AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST((epoch(a.w) - epoch(f.cohort_week)) // 604800 AS INTEGER)
             AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM firstw f JOIN active a USING (user_id)
    GROUP BY f.cohort_week, week_offset
    """,
)
def analytic_weekly_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-seen week, counted
    in each subsequent active week.  Two shuffles (per-user min, then the
    cohort aggregate); the user_id join is co-partitioned with the first
    aggregate so AQE usually elides the exchange."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    wk = F.date_trunc("week", F.col("ts"))
    firstw = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = e.select("user_id", wk.alias("w")).distinct()
    j = firstw.join(active, "user_id")
    offset = (
        (F.unix_timestamp("w") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("int")
    return (
        j.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            offset.alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "window_percent_rank_cume_dist",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey)
    """,
)
def window_percent_rank_cume_dist(spark, sf_dir):
    """Relative-position window functions (percent_rank, cume_dist) with a
    fully deterministic frame: ordering on the exact decimal price plus the
    key tiebreak removes duplicate-rank ambiguity across engines."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        dec2("o_totalprice"), F.col("o_orderkey")
    )
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "analytic_zscore_anomalies",
    oracle="""
    WITH m AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
               AS DOUBLE) AS ss
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((CAST(e.value AS DOUBLE) - m.s / m.n)
                 / sqrt((m.ss - m.s * m.s / m.n) / (m.n - 1)), 6) AS z
    FROM events e JOIN m ON e.event_type = m.event_type
    WHERE abs((CAST(e.value AS DOUBLE) - m.s / m.n)
              / sqrt((m.ss - m.s * m.s / m.n) / (m.n - 1))) > 3
    """,
)
def analytic_zscore_anomalies(spark, sf_dir):
    """Per-type z-score outliers (|z| > 3).  The moments are EXACT decimal
    sums (sum, sum-of-squares) converted to double only inside the final
    formula, so the result is partition-order independent — the one weird
    trick that makes distributed variance deterministic.  The per-type
    moment table is tiny and broadcasts back onto the fact."""
    e = t(spark, sf_dir, "events")
    v = dec2("value")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("ss"),
    )
    j = e.join(F.broadcast(m), "event_type")
    mean = F.col("s") / F.col("n")
    std = F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
    z = (F.col("value").cast("double") - mean) / std
    return (
        j.filter(F.abs(z) > 3)
        .select("event_id", "event_type", F.round(z, 6).alias("z"))
    )


@query(
    "window_running_distinct_statuses",
    oracle="""
    SELECT o_custkey, o_orderkey,
           count(DISTINCT o_orderstatus) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS statuses_seen  -- BIGINT in DuckDB; Spark side casts to match
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_distinct_statuses(spark, sf_dir):
    """Running count-distinct per customer.  Spark windows don't support
    COUNT(DISTINCT ...) OVER directly; the engine-equivalent spelling is
    size(collect_set() OVER frame) — per-partition state is the distinct
    set (bounded: 3 statuses), so the frame never rescans."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            big(F.size(F.collect_set("o_orderstatus").over(w))).alias("statuses_seen"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(stddev_samp(l_quantity), 6)                 AS qty_stddev,
           round(var_samp(l_quantity), 6)                    AS qty_var,
           round(avg(l_quantity), 6)                         AS qty_mean
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats_moments(spark, sf_dir):
    """Second-moment statistics (corr / covariance / stddev / variance) —
    the profiling aggregates behind feature normalization.  All built-in
    single-pass partial+final aggregates; rounding absorbs the (stable)
    last-bit differences between engines' update formulas."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_covar"
            ),
            F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
            F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
            F.round(F.avg("l_quantity"), 6).alias("qty_mean"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2))
               + CAST(25.50 AS DECIMAL(18,2)) AS o_totalprice
      FROM orders WHERE o_orderkey % 100 = 0
    ), inserts AS (
      SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
             'N' AS o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
      FROM orders WHERE o_orderkey % 1000 = 0
    ), cdc AS (
      SELECT * FROM updates UNION ALL SELECT * FROM inserts
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice
    FROM cdc
    UNION ALL
    SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus,
           round(CAST(CAST(b.o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2)
    FROM orders b LEFT JOIN cdc u ON u.o_orderkey = b.o_orderkey
    WHERE u.o_orderkey IS NULL
    ORDER BY o_orderkey
    """,
)
def merge_upsert_orders(spark, sf_dir):
    """MERGE/upsert semantics on plain parquet tables (no table-format
    dependency): CDC rows win on key match, unmatched base rows survive,
    new keys insert — expressed as (cdc UNION ALL base-anti-join-cdc).
    Scale: one shuffle on the merge key; with a bucketed base table the
    anti join co-locates and the rewrite touches only matched buckets
    (see sources/formats.write_bucketed)."""
    o = t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", dec2("o_totalprice").alias("o_totalprice")
    )
    updates = base.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice",
        F.col("o_totalprice") + F.lit(25.50).cast("decimal(18,2)"),
    )
    inserts = base.filter(F.col("o_orderkey") % 1000 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    cdc = updates.unionByName(inserts)
    survived = base.join(cdc.select("o_orderkey"), "o_orderkey", "left_anti")
    return (
        cdc.unionByName(survived)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            money2(F.col("o_totalprice")).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scd2_customer_priority_history",
    oracle="""
    WITH yearly AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
             min(o_orderpriority) AS priority
      FROM orders GROUP BY o_custkey, year(o_orderdate)
    ), changes AS (
      SELECT o_custkey, yr, priority,
             lag(priority) OVER (PARTITION BY o_custkey ORDER BY yr) AS prev
      FROM yearly
    ), versions AS (
      SELECT o_custkey, yr AS valid_from, priority
      FROM changes WHERE prev IS NULL OR prev <> priority
    )
    SELECT o_custkey, valid_from,
           COALESCE(lead(valid_from) OVER (PARTITION BY o_custkey
                                           ORDER BY valid_from) - 1,
                    9999) AS valid_to,
           priority
    FROM versions
    ORDER BY o_custkey, valid_from
    """,
)
def scd2_customer_priority_history(spark, sf_dir):
    """Type-2 slowly-changing-dimension build: collapse a yearly attribute
    feed into [valid_from, valid_to] version rows (new row only when the
    value changes; open version capped at 9999).  Two windows over the
    same (custkey, yr) partitioning — Catalyst reuses one sort+shuffle for
    both, so the whole history build is a single exchange."""
    o = t(spark, sf_dir, "orders")
    yearly = (
        o.groupBy("o_custkey", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.min("o_orderpriority").alias("priority"))
    )
    w = Window.partitionBy("o_custkey").orderBy("yr")
    versions = (
        yearly.withColumn("prev", F.lag("priority").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("priority")))
        .select("o_custkey", F.col("yr").alias("valid_from"), "priority")
    )
    wv = Window.partitionBy("o_custkey").orderBy("valid_from")
    return (
        versions.withColumn(
            "valid_to",
            F.coalesce(F.lead("valid_from").over(wv) - 1, F.lit(9999)),
        )
        .select("o_custkey", "valid_from", "valid_to", "priority")
        .orderBy("o_custkey", "valid_from")
    )


@query(
    "window_trailing_7day_revenue",
    oracle="""
    SELECT o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS trailing_7d
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, order_date, o_orderkey
    """,
)
def window_trailing_7day_revenue(spark, sf_dir):
    """Time-interval RANGE frame: per customer, revenue in the trailing
    7 days of each order (including same-timestamp peers — RANGE, not
    ROWS).  Both engines order by epoch seconds so the frame bound is the
    same integer arithmetic.  Scale: one shuffle on custkey; the frame is
    evaluated with a sliding aggregate inside the sorted partition, not a
    rescan per row."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, 0)
    )
    return o.select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "o_orderkey",
        money2(F.sum(dec2("o_totalprice")).over(w)).alias("trailing_7d"),
    ).orderBy("o_custkey", "order_date", "o_orderkey")


@query(
    "analytic_active_users_dau_wau",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      FROM events WHERE user_id IS NOT NULL
    ), days AS (
      SELECT DISTINCT day FROM pairs
    ), contrib AS (
      SELECT p.user_id,
             CAST(unnest(generate_series(p.day, p.day + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM pairs p
    ), wau AS (
      SELECT c.day, count(DISTINCT c.user_id) AS wau
      FROM contrib c JOIN days d ON d.day = c.day
      GROUP BY c.day
    ), dau AS (
      SELECT day, count(*) AS dau FROM pairs GROUP BY day
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           d.dau, w.wau,
           round(d.dau * 1.0 / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w USING (day)
    """,
)
def analytic_active_users_dau_wau(spark, sf_dir):
    """Daily and trailing-7-day active users per day, plus the DAU/WAU
    "stickiness" ratio — the dashboard triple every event warehouse
    serves.

    The WAU is computed WITHOUT a range join or a per-day re-scan: each
    distinct (user, day) pair is exploded into the <=7 target days it
    contributes to (a fixed 7x fan-out of the deduped pair table, linear
    at any scale), then one hash aggregate per target day counts the
    distinct contributors.  Synthetic trailing days past the observed
    range are pruned with a broadcast semi-join against the day
    dictionary.  Compare the naive day-x-events interval join: a shuffle
    of |days| x |events| candidate rows that AQE can only mitigate, not
    remove."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    pairs = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = pairs.select("day").distinct()
    contrib = pairs.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("day"),
    ).join(F.broadcast(days), "day", "left_semi")
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


@query(
    "analytic_event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE user_id IS NOT NULL
    ), trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           round(CAST(n AS DOUBLE) /
                 sum(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM trans
    ORDER BY prev_type, next_type
    """,
)
def analytic_event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current event type), the model behind
    next-action prediction and funnel-drop analysis.  (ts, event_id)
    ordering makes simultaneous events deterministic on both engines.

    Scale: ONE shuffle on user_id serves the sequence window (per-user
    partitions are session-sized); the transition counts then collapse to
    a |types|^2 table whose groupBy and row-normalizing window are
    trivially small.  No self-join of the event stream against itself —
    the lag window is the linear-cost formulation."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wnorm = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wnorm), 6).alias("p"),
    ).orderBy("prev_type", "next_type")


@query(
    "analytic_copurchase_part_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 25
    """,
)
def analytic_copurchase_part_pairs(spark, sf_dir):
    """Market-basket co-occurrence: the top-25 part pairs appearing in the
    same order (association-rule support counting).  The self-join is on
    the ORDER key, so its fan-out is items-per-order squared (~7^2 = a few
    dozen rows per order) — linear in order count, never corpus-quadratic;
    the distinct collapses duplicate part lines map-side before the join,
    and the final top-k is TakeOrderedAndProject with (part_a, part_b)
    tiebreaks for engine-independent determinism."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(25)
    )


@query(
    "analytic_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, frequency, monetary,
             ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_quartile,
             ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_quartile,
             ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_quartile
      FROM rfm
    )
    SELECT r_quartile, f_quartile, m_quartile,
           count(*) AS n_customers,
           round(CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS segment_value
    FROM scored
    GROUP BY r_quartile, f_quartile, m_quartile
    ORDER BY r_quartile, f_quartile, m_quartile
    """,
)
def analytic_rfm_segments(spark, sf_dir):
    """RFM customer segmentation: quartile scores for recency (last order
    date), frequency (order count), and monetary value, rolled up to
    segment sizes and value — the classic warehouse cohorting query.
    Every ntile orders by (metric, customer id) so tie assignment is
    deterministic and engine-independent; monetary aggregates stay in
    exact decimals until the final cosmetic round.

    Scale: one shuffle for the per-customer aggregate; the three ntile
    windows are unpartitioned BY DEFINITION (global quartiles) but run
    over the customer-level table — orders of magnitude smaller than the
    fact table; a 100 TB deployment with billions of customers would
    swap ntile for a two-pass approx-quantile cut, trading exactness for
    partitioned windows."""
    o = t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        money2(F.sum(dec2("o_totalprice"))).alias("monetary"),
    )
    scored = rfm.select(
        "o_custkey",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("last_order", "o_custkey"))
        .cast("bigint")
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy("frequency", "o_custkey"))
        .cast("bigint")
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy("monetary", "o_custkey"))
        .cast("bigint")
        .alias("m_quartile"),
    )
    return (
        scored.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money2(F.sum(dec2("monetary"))).alias("segment_value"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


@query(
    "analytic_event_pareto_share",
    oracle="""
    WITH per_user AS (
      SELECT user_id, count(*) AS n FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id
    ), ranked AS (
      SELECT n, ntile(10) OVER (ORDER BY n DESC, user_id) AS decile
      FROM per_user
    ), agg AS (
      SELECT decile, count(*) AS n_users, CAST(sum(n) AS BIGINT) AS n_events
      FROM ranked GROUP BY decile
    )
    SELECT decile, n_users, n_events,
           round(CAST(sum(n_events) OVER (ORDER BY decile) AS DOUBLE)
                 / (SELECT sum(n) FROM per_user), 6) AS cum_events_share
    FROM agg
    ORDER BY decile
    """,
)
def analytic_event_pareto_share(spark, sf_dir):
    """Activity concentration (Pareto/Lorenz): split users into activity
    deciles (most-active first; user_id breaks count ties
    deterministically) and report each decile's cumulative share of all
    events — the "do 20% of users generate 80% of traffic" curve.

    Scale: the per-user aggregate is the only fact-table shuffle; the
    decile ntile and cumulative window then run over the user-level
    table.  The grand total rides along as a broadcast scalar."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = per_user.select(
        "n",
        F.ntile(10)
        .over(Window.orderBy(F.desc("n"), F.asc("user_id")))
        .cast("bigint")
        .alias("decile"),
    )
    agg = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    total = per_user.agg(F.sum("n").cast("bigint").alias("_tot"))
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_users",
            "n_events",
            F.round(
                F.sum("n_events").over(wcum).cast("double") / F.col("_tot"), 6
            ).alias("cum_events_share"),
        )
        .orderBy("decile")
    )


@query(
    "analytic_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(floor(epoch(min(CASE WHEN event_type = 'view' THEN ts END)))
                  AS BIGINT) AS t_view,
             CAST(floor(epoch(min(CASE WHEN event_type = 'purchase' THEN ts END)))
                  AS BIGINT) AS t_purchase
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), converts AS (
      SELECT t_purchase - t_view AS secs
      FROM firsts
      WHERE t_view IS NOT NULL AND t_purchase IS NOT NULL
        AND t_purchase >= t_view
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converters,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY secs), 6) AS p50_secs,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY secs), 6) AS p90_secs,
           CAST(min(secs) AS BIGINT) AS min_secs,
           CAST(max(secs) AS BIGINT) AS max_secs
    FROM converts
    """,
)
def analytic_time_to_convert(spark, sf_dir):
    """Time-to-convert distribution: seconds between each user's first
    view and first purchase (converters only), summarized as exact
    interpolated p50/p90 with min/max — the latency companion to the
    conversion funnel.

    Scale: one user-key aggregate over the fact table (conditional mins
    combine map-side); the percentile runs over the converter deltas —
    user-level, not event-level.  At 100 TB swap the exact percentile
    for approx_percentile; the exact form is the oracle-able contract."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    firsts = e.groupBy("user_id").agg(
        F.unix_timestamp(
            F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        ).alias("t_view"),
        F.unix_timestamp(
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("t_purchase"),
    )
    converts = firsts.filter(
        F.col("t_view").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_view"))
    ).select((F.col("t_purchase") - F.col("t_view")).alias("secs"))
    ps = F.expr("percentile(secs, array(0.5D, 0.9D))")
    return converts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converters"),
        F.round(F.element_at(ps, 1), 6).alias("p50_secs"),
        F.round(F.element_at(ps, 2), 6).alias("p90_secs"),
        F.min("secs").cast("bigint").alias("min_secs"),
        F.max("secs").cast("bigint").alias("max_secs"),
    )


@query(
    "analytic_burst_rate_outliers",
    oracle="""
    WITH per_min AS (
      SELECT user_id,
             CAST(floor(floor(epoch(ts)) / 60) AS BIGINT) AS minute,
             count(*) AS n
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id, 2
    ), peaks AS (
      SELECT user_id,
             CAST(max(n) AS BIGINT) AS peak_per_min,
             CAST(sum(n) AS BIGINT) AS total_events,
             CAST(count(*) AS BIGINT) AS active_minutes
      FROM per_min GROUP BY user_id
    )
    SELECT user_id, peak_per_min, total_events, active_minutes
    FROM peaks
    WHERE peak_per_min >= 2
    ORDER BY peak_per_min DESC, user_id
    """,
)
def analytic_burst_rate_outliers(spark, sf_dir):
    """Bot/abuse screening: users whose PEAK per-minute event rate crosses
    a threshold, with their totals for triage — the rate-limit violation
    report (threshold 2 fits this sparse synthetic corpus, whose observed
    max is 2/min; production sets it from the rate-limit policy).  Epoch-minute bucketing uses explicit integer
    arithmetic (floor(epoch/60)), identical on both engines.

    Scale: the minute-bucket aggregate combines map-side (a user's burst
    lands in few buckets); the per-user peak is a second tiny aggregate.
    No windows over raw events, no self-joins — two groupBys, both
    partial-aggregated."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per_min = e.groupBy(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 60).cast("bigint").alias("minute"),
    ).agg(F.count(F.lit(1)).alias("n"))
    peaks = per_min.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("peak_per_min"),
        F.sum("n").cast("bigint").alias("total_events"),
        F.count(F.lit(1)).cast("bigint").alias("active_minutes"),
    )
    return (
        peaks.filter(F.col("peak_per_min") >= 2)
        .orderBy(F.desc("peak_per_min"), F.asc("user_id"))
    )


@query(
    "analytic_cohort_ltv_triangle",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             CAST(year(min(o_orderdate)) AS BIGINT) AS cohort_year
      FROM orders GROUP BY o_custkey
    ), spend AS (
      SELECT f.cohort_year,
             CAST(year(o.o_orderdate) AS BIGINT) - f.cohort_year AS order_age,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT cohort_year, order_age,
           count(*) AS n_orders,
           round(CAST(sum(price) AS DOUBLE), 2) AS revenue
    FROM spend
    GROUP BY cohort_year, order_age
    ORDER BY cohort_year, order_age
    """,
)
def analytic_cohort_ltv_triangle(spark, sf_dir):
    """Customer-lifetime-value triangle: revenue by acquisition-year
    cohort x years-since-acquisition — the table LTV curves and payback
    analyses read off.  The orders-based twin of the events-based weekly
    retention cohorts.

    Scale: one customer-key aggregate finds cohort years; the fact table
    then joins that (broadcast-able, one row per customer) and
    re-aggregates on the tiny (cohort, age) key — exact decimal revenue
    throughout."""
    o = t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.year(F.min("o_orderdate")).cast("bigint").alias("cohort_year")
    )
    spend = o.join(firsts, "o_custkey").select(
        "cohort_year",
        (F.year("o_orderdate").cast("bigint") - F.col("cohort_year")).alias(
            "order_age"
        ),
        dec2("o_totalprice").alias("price"),
    )
    return (
        spend.groupBy("cohort_year", "order_age")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money2(F.sum("price")).alias("revenue"),
        )
        .orderBy("cohort_year", "order_age")
    )


@query(
    "analytic_interpurchase_gaps",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             date_diff('day',
               lag(o_orderdate) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap_days
      FROM orders
    ), gaps AS (
      SELECT CAST(gap_days AS BIGINT) AS gap_days
      FROM seq WHERE gap_days IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_days), 6)
             AS p50_days,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY gap_days), 6)
             AS p90_days,
           CAST(min(gap_days) AS BIGINT) AS min_days,
           CAST(max(gap_days) AS BIGINT) AS max_days
    FROM gaps
    """,
)
def analytic_interpurchase_gaps(spark, sf_dir):
    """Inter-purchase cadence: the distribution of day gaps between a
    customer's consecutive orders (exact interpolated p50/p90 + range) —
    the re-order clock behind churn models and replenishment campaigns.
    (o_orderdate, o_orderkey) ordering pins same-day orders
    deterministically; DuckDB date subtraction yields integer days and
    Spark datediff matches it exactly.

    Scale: one customer-key window pass over the fact table (partitions
    are per-customer order counts), then a percentile over the gap
    deltas."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap_days")
        )
        .filter(F.col("gap_days").isNotNull())
        .select(F.col("gap_days").cast("bigint").alias("gap_days"))
    )
    ps = F.expr("percentile(gap_days, array(0.5D, 0.9D))")
    return gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.element_at(ps, 1), 6).alias("p50_days"),
        F.round(F.element_at(ps, 2), 6).alias("p90_days"),
        F.min("gap_days").cast("bigint").alias("min_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
    )


@query(
    "analytic_event_path_top3",
    oracle="""
    WITH seq AS (
      SELECT event_type AS e1,
             lead(event_type)    OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events WHERE user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path,
             CAST(count(*) AS BIGINT) AS n_paths
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n_paths, rnk FROM (
      SELECT path, n_paths,
             CAST(row_number() OVER (ORDER BY n_paths DESC, path) AS BIGINT)
               AS rnk
      FROM paths
    ) WHERE rnk <= 10
    """,
)
def analytic_event_path_top3(spark, sf_dir):
    """Top-10 most common 3-event paths (behavioral trigrams) across user
    sessions — the path-mining report behind funnel discovery.  Sequences
    order by (ts, event_id) so simultaneous events rank deterministically.

    Scale: one shuffle on user_id for the lead window (per-user state is
    two lookahead rows), then a map-side-combined count on the trigram
    string and a global top-10 — the final rank runs on the tiny
    aggregated path table, never on raw events."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.select(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).groupBy("path").agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    rw = Window.orderBy(F.desc("n_paths"), F.asc("path"))
    return (
        paths.withColumn("rnk", big(F.row_number().over(rw)))
        .filter(F.col("rnk") <= 10)
        .select("path", "n_paths", "rnk")
    )


@query(
    "analytic_user_survival_weeks",
    oracle="""
    WITH spans AS (
      SELECT user_id,
             CAST(floor((floor(epoch(max(ts))) - floor(epoch(min(ts))))
                        / 604800) + 1 AS BIGINT) AS weeks
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), dist AS (
      SELECT weeks, CAST(count(*) AS BIGINT) AS n_users
      FROM spans GROUP BY weeks
    )
    SELECT weeks, n_users,
           CAST(sum(n_users) OVER (ORDER BY weeks DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_survivors,
           round(CAST(sum(n_users) OVER (ORDER BY weeks DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(sum(n_users) OVER () AS DOUBLE), 6) AS survival_rate
    FROM dist ORDER BY weeks
    """,
)
def analytic_user_survival_weeks(spark, sf_dir):
    """Discrete survival curve: for each observed lifespan k (weeks between
    a user's first and last event, inclusive), how many users survived AT
    LEAST k weeks and what fraction of the base that is — the
    Kaplan-Meier-style retention view (no censoring: the synthetic corpus
    has a closed observation window).

    Scale: per-user span is one map-side-combined min/max aggregate over
    raw events; everything after runs on the tiny lifespan-distribution
    table (one row per distinct lifespan), where the unpartitioned windows
    are benign by construction — the same justification as the shard-total
    prefix sum in packing.py."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    spans = e.groupBy("user_id").agg(
        (
            F.floor(
                (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
                / 604800
            )
            + 1
        )
        .cast("bigint")
        .alias("weeks")
    )
    dist = spans.groupBy("weeks").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    cum = (
        Window.orderBy(F.desc("weeks"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return dist.select(
        "weeks",
        "n_users",
        F.sum("n_users").over(cum).cast("bigint").alias("n_survivors"),
        F.round(
            F.sum("n_users").over(cum).cast("double")
            / F.sum("n_users").over(total).cast("double"),
            6,
        ).alias("survival_rate"),
    ).orderBy("weeks")


@query(
    "analytic_yoy_revenue_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT c.yr, c.mo, c.revenue,
           p.revenue AS prev_year_revenue,
           round(c.revenue / p.revenue - 1, 6) AS yoy_growth
    FROM monthly c LEFT JOIN monthly p ON p.yr = c.yr - 1 AND p.mo = c.mo
    ORDER BY c.yr, c.mo
    """,
)
def analytic_yoy_revenue_growth(spark, sf_dir):
    """Year-over-year monthly revenue growth.  The prior-year month comes
    from a KEY join (yr-1, mo), not ``lag(12)`` — a 12-row lag silently
    reads the wrong month whenever a month is missing from the series,
    and key arithmetic is engine-independent.

    Scale: the monthly aggregate map-side combines raw orders into a
    <=84-row series; the self-join and sort run on that tiny table (AQE
    broadcasts it), so raw facts shuffle exactly once."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
    ).agg(money2(F.sum(dec2("o_totalprice"))).alias("revenue"))
    prev = monthly.select(
        (F.col("yr") + 1).alias("yr"),
        F.col("mo").alias("mo"),
        F.col("revenue").alias("prev_year_revenue"),
    )
    return (
        monthly.join(prev, ["yr", "mo"], "left")
        .select(
            "yr",
            "mo",
            "revenue",
            "prev_year_revenue",
            F.round(F.col("revenue") / F.col("prev_year_revenue") - 1, 6).alias(
                "yoy_growth"
            ),
        )
        .orderBy("yr", "mo")
    )


@query(
    "analytic_order_backlog_sweep",
    oracle="""
    WITH completion AS (
      SELECT l_orderkey, max(l_shipdate) AS done_d FROM lineitem
      GROUP BY l_orderkey
    ), deltas AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS month_key,
             1 AS delta
      FROM orders
      UNION ALL
      SELECT CAST(EXTRACT(year FROM done_d) * 100
                  + EXTRACT(month FROM done_d) AS BIGINT), -1
      FROM completion
    ), monthly AS (
      SELECT month_key, CAST(sum(delta) AS BIGINT) AS net_change
      FROM deltas GROUP BY month_key
    )
    SELECT month_key, net_change,
           CAST(sum(net_change) OVER (ORDER BY month_key
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS open_backlog
    FROM monthly ORDER BY month_key
    """,
)
def analytic_order_backlog_sweep(spark, sf_dir):
    """Open-order backlog over time by SWEEP LINE: +1 when an order is
    placed, -1 when its last lineitem ships, cumulative-summed over months
    — interval counting with NO range join (the naive "orders active in
    month m" formulation is a months x orders non-equi join that Spark
    executes as a nested loop).

    Scale: the completion date is one map-side-combined max per order; the
    delta stream aggregates to one row per month BEFORE the cumulative
    window, so the unpartitioned running sum touches ~84 rows — the
    packing.py shard-totals justification again.  Sweep line turns any
    interval-overlap count into two linear aggregates at any scale."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    mk = lambda c: (F.year(c) * 100 + F.month(c)).cast("bigint")
    completion = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("done_d"))
    deltas = o.select(
        mk(F.col("o_orderdate")).alias("month_key"), F.lit(1).alias("delta")
    ).unionAll(
        completion.select(
            mk(F.col("done_d")).alias("month_key"), F.lit(-1).alias("delta")
        )
    )
    monthly = deltas.groupBy("month_key").agg(
        F.sum("delta").cast("bigint").alias("net_change")
    )
    w = Window.orderBy("month_key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return monthly.select(
        "month_key",
        "net_change",
        F.sum("net_change").over(w).cast("bigint").alias("open_backlog"),
    ).orderBy("month_key")


@query(
    "analytic_basket_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), nord AS (
      SELECT count(DISTINCT l_orderkey) AS n FROM items
    ), part_n AS (
      SELECT l_partkey, count(*) AS n_part FROM items GROUP BY l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_both
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(*) >= 3
    )
    SELECT p.part_a, p.part_b, p.n_both,
           pa.n_part AS n_a, pb.n_part AS n_b,
           round(CAST(p.n_both * nord.n AS DOUBLE)
                 / (pa.n_part * pb.n_part), 6) AS lift
    FROM pairs p
    JOIN part_n pa ON pa.l_partkey = p.part_a
    JOIN part_n pb ON pb.l_partkey = p.part_b
    CROSS JOIN nord
    ORDER BY lift DESC, part_a, part_b
    LIMIT 25
    """,
)
def analytic_basket_lift(spark, sf_dir):
    """Association-rule LIFT: for part pairs co-occurring in >= 3 orders,
    ``lift = P(a,b) / (P(a) P(b)) = n_both * N / (n_a * n_b)`` — the
    normalization that separates genuinely associated items from merely
    popular ones (analytic_copurchase_part_pairs ranks raw support, which
    top-ranks whatever sells most; lift surfaces the surprising pairs).

    Exactness: the ratio divides two exact integer products, rounded once.
    Scale: the pair fan-out is the same order-key self-join bounded by
    items-per-order squared; part marginals are one map-side-combined
    aggregate; N is a 1-row broadcast; the support floor (>= 3) keeps the
    pair table sparse before the marginal joins (broadcast here; at huge
    part cardinality they become co-partitioned shuffle joins on the part
    key), and the final top-k is TakeOrderedAndProject with
    (part_a, part_b) tiebreaks."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.select(
        F.countDistinct("l_orderkey").alias("n")
    )
    part_n = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    return (
        # NO broadcast hint on the marginals: Catalyst/AQE auto-broadcasts
        # them at this scale, and at huge part cardinality the same plan
        # correctly degrades to co-partitioned shuffle joins on the part
        # key — a forced hint would OOM there instead
        pairs.join(
            part_n.select(F.col("l_partkey").alias("part_a"),
                          F.col("n_part").alias("n_a")),
            "part_a",
        )
        .join(
            part_n.select(F.col("l_partkey").alias("part_b"),
                          F.col("n_part").alias("n_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a", "part_b", "n_both", "n_a", "n_b",
            F.round(
                (F.col("n_both") * F.col("n")).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(25)
    )


@query(
    "analytic_new_vs_returning_weekly",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events WHERE user_id IS NOT NULL
    ), firsts AS (
      SELECT user_id, min(week) AS first_week FROM wk GROUP BY user_id
    )
    SELECT strftime(w.week, '%Y-%m-%d') AS week_start,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(count(*) FILTER (WHERE f.first_week = w.week) AS BIGINT)
             AS n_new,
           CAST(count(*) FILTER (WHERE f.first_week < w.week) AS BIGINT)
             AS n_returning,
           round(CAST(count(*) FILTER (WHERE f.first_week < w.week)
                      AS DOUBLE) / count(*), 6) AS returning_share
    FROM wk w JOIN firsts f ON f.user_id = w.user_id
    GROUP BY w.week ORDER BY w.week
    """,
)
def analytic_new_vs_returning_weekly(spark, sf_dir):
    """Weekly NEW vs RETURNING actives — the growth-accounting split every
    product dashboard leads with (is usage growing by acquisition or by
    retention?).  A user is "new" in the ISO week (Monday-start, both
    engines' date_trunc convention) of their first-ever event, "returning"
    in every later active week.

    Scale: the corpus reduces to distinct (user, week) pairs map-side
    first; each user's first week is one more partial aggregate on the
    SAME user-keyed shuffle, and the final join is between two
    user-partitioned frames Catalyst co-partitions — no event-level data
    survives past the first aggregate.  returning_share divides the two
    exact counts."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    firsts = wk.groupBy("user_id").agg(F.min("week").alias("first_week"))
    j = wk.join(firsts, "user_id")
    return (
        j.groupBy("week")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(F.when(F.col("first_week") == F.col("week"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(F.col("first_week") < F.col("week"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_returning"),
        )
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week_start"),
            "n_active",
            "n_new",
            "n_returning",
            F.round(
                F.col("n_returning").cast("double") / F.col("n_active"), 6
            ).alias("returning_share"),
        )
        .orderBy("week_start")
    )
