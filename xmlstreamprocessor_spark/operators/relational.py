"""Core relational operators (SURVEY.md §2B: scans, filters, joins of every
type, aggregations incl. distinct/rollup/cube/grouping-sets, sorts/limits,
set ops, scalar function library, JSON access).

The reference has none of these (its entire engine is extraction —
Parser.cs:1-538); they are mandated extensions.  All plans are declarative
DataFrame/SQL so Catalyst supplies pushdown, pruning, join selection, and
whole-stage codegen.  Scale notes are on each operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlstreamprocessor_spark.operators.registry import (
    avg6,
    big,
    dec2,
    fmt_d,
    money2,
    money4,
    query,
    t,
)

# ---------------------------------------------------------------------------
# TPC-H-style analytical queries
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)      AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS sum_disc_price,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))
               * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE), 6)      AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6)                          AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6)                          AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: single wide scan -> partial+final hash aggregate.
    Scale: no join; the groupBy key space is 6 rows so map-side partial
    aggregation collapses virtually all data before the shuffle."""
    l = t(spark, sf_dir, "lineitem")
    qty, price, disc, tax = (
        dec2("l_quantity"),
        dec2("l_extendedprice"),
        F.col("l_discount").cast("decimal(4,2)"),
        F.col("l_tax").cast("decimal(4,2)"),
    )
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money2(F.sum(qty)).alias("sum_qty"),
            money2(F.sum(price)).alias("sum_base_price"),
            F.round(F.sum(price * (F.lit(1) - disc)).cast("double"), 4).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double"), 6
            ).alias("sum_charge"),
            avg6(F.sum(qty), F.count(F.lit(1))).alias("avg_qty"),
            avg6(F.sum(price), F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. Scale: filters go below the joins (Catalyst pushes
    them into the parquet scans); customer is the smallest side and AQE
    turns it into a broadcast once the filter's selectivity is seen."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    disc_price = dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(money4(F.sum(disc_price)).alias("revenue"))
        .select("o_orderkey", "revenue", fmt_d("o_orderdate").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join. Scale: nation/region/supplier are
    explicitly broadcast (they stay tiny at any SF), so the only shuffles
    are the orders<->lineitem join and the final 25-row aggregate."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = F.broadcast(t(spark, sf_dir, "supplier"))
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    disc_price = dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(money4(F.sum(disc_price)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q6_revenue_forecast",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark, sf_dir):
    """TPC-H Q6 shape: pure scan+filter+agg. Scale: every predicate is
    parquet-pushable (verify PushedFilters in .explain) and only 4 columns
    are read; this is the canonical predicate-pushdown check."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        ).agg(
            money4(
                F.sum(dec2("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_revenue_per_nation",
    oracle="""
    SELECT n.n_name,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q_revenue_per_nation(spark, sf_dir):
    """Flagship query (entry()): fact-fact join + broadcast dim + agg."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    disc_price = dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            money4(F.sum(disc_price)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# join family (SURVEY.md §2B: inner/left/right/full/semi/anti/cross/non-equi)
# ---------------------------------------------------------------------------


@query(
    "join_left_customer_order_stats",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           round(CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)
                 AS DOUBLE), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_customer_order_stats(spark, sf_dir):
    """LEFT OUTER join preserving customers with zero orders. Scale: both
    sides shuffle on custkey; at 100 TB bucket both tables by custkey to
    make this a zero-shuffle sort-merge join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            money2(
                F.coalesce(F.sum(dec2("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            ).alias("total_spent"),
        )
    )


@query(
    "join_semi_customers_with_high_value_order",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi_customers_with_high_value_order(spark, sf_dir):
    """LEFT SEMI join == EXISTS. Scale: semi-join only carries the left
    columns through the shuffle; the filter on the right side is pushed to
    the scan."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark, sf_dir):
    """LEFT ANTI join == NOT EXISTS."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_full_outer_nation_presence",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_customers
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
                FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer_nation_presence(spark, sf_dir):
    """FULL OUTER join of two pre-aggregated sides (aggregate-before-join:
    shrinks both inputs to |nations| rows before the join shuffle)."""
    cn = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cn.join(sn, cn.nk == sn.nk, "full_outer").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    """,
)
def join_cross_region_pairs(spark, sf_dir):
    """CROSS join (guarded: only ever on bounded dims — 5x5 here)."""
    a = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("ka"), F.col("r_name").alias("region_a")
    )
    b = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("kb"), F.col("r_name").alias("region_b")
    )
    return a.crossJoin(b).filter(F.col("ka") < F.col("kb")).select("region_a", "region_b")


@query(
    "join_right_orders_customer_segment",
    oracle="""
    SELECT c.c_mktsegment, count(o.o_orderkey) AS n_orders
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_right_orders_customer_segment(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_nonequi_price_band",
    oracle="""
    SELECT p.p_partkey, count(*) AS n_cheaper_suppliers
    FROM part p JOIN supplier s ON s.s_acctbal > p.p_retailprice / 100
    WHERE p.p_partkey <= 50
    GROUP BY p.p_partkey
    """,
)
def join_nonequi_price_band(spark, sf_dir):
    """Theta (non-equi) join -> broadcast nested loop. Scale: keep one side
    broadcastable (here part is pre-filtered to a bounded key range);
    unbounded theta joins need banding/bucketing instead."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    s = t(spark, sf_dir, "supplier")
    return (
        F.broadcast(p)
        .join(s, s.s_acctbal > p.p_retailprice / 100)
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_cheaper_suppliers"))
    )


# ---------------------------------------------------------------------------
# aggregation family
# ---------------------------------------------------------------------------


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT c_mktsegment,
           count(DISTINCT c_nationkey) AS n_nations,
           count(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_distinct_counts(spark, sf_dir):
    """COUNT(DISTINCT) — Spark expands to a two-phase partial-distinct
    aggregate; no driver-side work."""
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "agg_rollup_order_year_priority",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           o_orderpriority,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (CAST(year(o_orderdate) AS BIGINT), o_orderpriority)
    """,
)
def agg_rollup_order_year_priority(spark, sf_dir):
    """ROLLUP hierarchy (year -> priority -> grand total)."""
    o = t(spark, sf_dir, "orders").withColumn(
        "order_year", big(F.year("o_orderdate"))
    )
    return o.rollup("order_year", "o_orderpriority").agg(
        money2(F.sum(dec2("o_totalprice"))).alias("total"), F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_lineitem_flags(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), money2(F.sum(dec2("l_quantity"))).alias("qty"))
    )


@query(
    "agg_grouping_sets_mixed",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets_mixed(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("xsp_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM xsp_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_minmax_stats",
    oracle="""
    SELECT l_linestatus,
           min(l_quantity)  AS min_qty,
           max(l_quantity)  AS max_qty,
           min(strftime(l_shipdate, '%Y-%m-%d')) AS first_ship,
           max(strftime(l_shipdate, '%Y-%m-%d')) AS last_ship,
           count(*) AS n
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_minmax_stats(spark, sf_dir):
    """min/max are order-insensitive — safe on raw doubles."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min(fmt_d("l_shipdate")).alias("first_ship"),
            F.max(fmt_d("l_shipdate")).alias("last_ship"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)  AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS parts_within_tol,
           TRUE AS orders_within_tol
    FROM lineitem
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL++, rsd=0.05) — the scale path for
    high-cardinality distinct counts.  The estimate itself has no SQL
    oracle by construction, so the CONTRACT is oracle-able instead: emit
    the exact counts plus a within-tolerance flag for each estimate (HLL
    is deterministic for a given dataset, so the flags are stable).  A
    driver hash mismatch here means the sketch drifted outside 3x its
    configured rsd — a real regression, not noise."""
    tol = 0.15  # 3 x rsd
    return t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.05)
                - F.countDistinct("l_partkey")
            )
            <= F.countDistinct("l_partkey") * tol
        ).alias("parts_within_tol"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", 0.05)
                - F.countDistinct("l_orderkey")
            )
            <= F.countDistinct("l_orderkey") * tol
        ).alias("orders_within_tol"),
    )


# ---------------------------------------------------------------------------
# sorts / limits / set ops / distinct
# ---------------------------------------------------------------------------


@query(
    "sort_top20_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def sort_top20_orders(spark, sf_dir):
    """ORDER BY + LIMIT -> Spark TakeOrderedAndProject: per-partition top-K
    then a K-row merge on the driver — no global sort at any scale."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", fmt_d("o_orderdate").alias("orderdate"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "setop_union_all_keys",
    oracle="""
    SELECT nk, count(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    """,
)
def setop_union_all_keys(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_nations(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except_nations(spark, sf_dir):
    # subtract == EXCEPT DISTINCT (set semantics, matching the SQL oracle);
    # exceptAll would be bag semantics and a different operator
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)


@query(
    "distinct_order_status_priority",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_order_status_priority(spark, sf_dir):
    return t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# ---------------------------------------------------------------------------
# scalar function library + JSON
# ---------------------------------------------------------------------------


@query(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                   AS brand_upper,
           lower(p_type)                    AS type_lower,
           CAST(length(p_name) AS BIGINT)   AS name_len,
           substr(p_name, 1, 5)             AS name_prefix,
           replace(p_type, ' ', '_')        AS type_snake,
           concat(p_brand, ':', p_type)     AS brand_type,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green
    FROM part WHERE p_partkey <= 100
    """,
)
def scalar_string_functions(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
    )


@query(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)    AS y,
           CAST(month(o_orderdate) AS INTEGER)   AS m,
           CAST(day(o_orderdate) AS INTEGER)     AS d,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
               AS days_since_epoch_start
    FROM orders WHERE o_orderkey <= 400
    """,
)
def scalar_date_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        fmt_d(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("bigint")
        .alias("days_since_epoch_start"),
    )


@query(
    "scalar_math_functions",
    oracle="""
    SELECT c_custkey,
           abs(c_acctbal)                  AS abs_bal,
           CAST(ceil(c_acctbal) AS BIGINT)  AS ceil_bal,
           CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
           round(c_acctbal, 1)             AS round_bal,
           round(sqrt(abs(c_acctbal)), 6)  AS sqrt_bal,
           CASE WHEN c_acctbal < 0 THEN -1 WHEN c_acctbal = 0 THEN 0 ELSE 1 END
               AS sign_bal
    FROM customer WHERE c_custkey <= 200
    """,
)
def scalar_math_functions(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.abs("c_acctbal").alias("abs_bal"),
        F.ceil("c_acctbal").cast("bigint").alias("ceil_bal"),
        F.floor("c_acctbal").cast("bigint").alias("floor_bal"),
        F.round("c_acctbal", 1).alias("round_bal"),
        F.round(F.sqrt(F.abs(F.col("c_acctbal"))), 6).alias("sqrt_bal"),
        F.when(F.col("c_acctbal") < 0, -1)
        .when(F.col("c_acctbal") == 0, 0)
        .otherwise(1)
        .alias("sign_bal"),
    )


@query(
    "json_extract_event_props",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_event_props(spark, sf_dir):
    """JSON access on the events.props column (get_json_object is JVM-side;
    no Python in the loop)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "subquery_in_top_nations",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey = 2
    ) AND c_custkey <= 300
    """,
)
def subquery_in_top_nations(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    c.createOrReplaceTempView("xsp_sub_customer")
    n.createOrReplaceTempView("xsp_sub_nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM xsp_sub_customer
        WHERE c_nationkey IN (
            SELECT n_nationkey FROM xsp_sub_nation WHERE n_regionkey = 2
        ) AND c_custkey <= 300
        """
    )


@query(
    "subquery_scalar_above_avg_price",
    oracle="""
    SELECT count(*) AS n_above
    FROM part
    WHERE p_retailprice > (SELECT round(CAST(sum(CAST(p_retailprice AS
        DECIMAL(18,2))) AS DOUBLE) / count(*), 6) FROM part)
    """,
)
def subquery_scalar_above_avg_price(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    p.createOrReplaceTempView("xsp_sub_part")
    return spark.sql(
        """
        SELECT count(*) AS n_above
        FROM xsp_sub_part
        WHERE p_retailprice > (SELECT round(CAST(sum(CAST(p_retailprice AS
            DECIMAL(18,2))) AS DOUBLE) / count(*), 6) FROM xsp_sub_part)
        """
    )


# ---------------------------------------------------------------------------
# percentiles, pivot, skew-salted aggregation
# ---------------------------------------------------------------------------


@query(
    "agg_percentiles_price_by_returnflag",
    oracle="""
    SELECT l_returnflag,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p50,
           round(percentile_cont(0.9)  WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p90,
           round(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles_price_by_returnflag(spark, sf_dir):
    """Exact interpolated percentiles per group.  Scale: Spark's percentile
    is a sort-based aggregate per group; for sketch-sized answers at 100 TB
    swap in approx_percentile (t-digest) — the exact form is the oracle-able
    contract."""
    l = t(spark, sf_dir, "lineitem")
    ps = F.expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))")
    return (
        l.groupBy("l_returnflag")
        .agg(ps.alias("ps"))
        .select(
            "l_returnflag",
            F.round(F.element_at("ps", 1), 6).alias("p50"),
            F.round(F.element_at("ps", 2), 6).alias("p90"),
            F.round(F.element_at("ps", 3), 6).alias("p99"),
        )
    )


@query(
    "pivot_status_totals_by_priority",
    oracle="""
    SELECT o_orderpriority,
           round(CAST(sum(CASE WHEN o_orderstatus = 'F'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS f,
           round(CAST(sum(CASE WHEN o_orderstatus = 'O'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS o,
           round(CAST(sum(CASE WHEN o_orderstatus = 'P'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_totals_by_priority(spark, sf_dir):
    """Pivot (long -> wide): one column per order status.  With explicit
    pivot values Spark skips the extra distinct-values job and the whole op
    is a single hash aggregate — same cost profile at any scale."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(money2(F.sum(dec2("o_totalprice"))))
        .withColumnsRenamed({"F": "f", "O": "o", "P": "p"})
    )


@query(
    "agg_salted_skewed_event_totals",
    oracle="""
    SELECT event_type,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skewed_event_totals(spark, sf_dir):
    """Two-phase salted aggregation for heavily skewed keys (events has ~5
    event types over millions of rows): phase 1 aggregates by (key, salt) so
    no single reducer owns a hot key, phase 2 combines the 16 partials per
    key.  Decimal sums are associative, so the result is bit-identical to the
    direct groupBy (the oracle).  At 100 TB this is the pattern that keeps a
    5-key aggregation from running on 5 tasks."""
    e = t(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.sum(dec2("value")).alias("pv"), F.count(F.lit(1)).alias("pn")
    )
    return partial.groupBy("event_type").agg(
        money2(F.sum("pv")).alias("total_value"), F.sum("pn").alias("n")
    )


@query(
    "join_salted_skewed_events_segment",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_events,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def join_salted_skewed_events_segment(spark, sf_dir):
    """Salted equi-join: the skew-mitigation twin of
    ``agg_salted_skewed_event_totals`` for JOINS.  When one join key owns
    a disproportionate share of the fact side (one celebrity user, one
    default account id), a plain shuffle join lands that key's entire
    volume on ONE task.  The lossless rewrite: salt the fact side
    (salt = hash(row) % S computed in the scan stage), replicate the
    dimension side S times via an explode, and equi-join on
    (key, salt) — every hot key's rows spread over S tasks, at the cost
    of an S-times-larger (still small) dimension shuffle.  Decimal sums
    make the re-aggregated result bit-identical to the direct join (the
    oracle).  AQE's skew-join split handles MODERATE skew adaptively;
    explicit salting is the deterministic fallback for pathological keys
    and for engines/stages AQE cannot rewrite."""
    _S = 8
    e = t(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(_S))
    )
    c = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(_S - 1)))
        )
    )
    return (
        e.join(
            c,
            (e["user_id"] == c["c_custkey"]) & (e["salt"] == c["salt"]),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money2(F.sum(dec2("value"))).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6)
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: fact-dim join + conditional aggregate ratio.  Scale:
    the shipdate filter is pushed into the lineitem scan; part joins on its
    key (broadcast under the 64 MB threshold, AQE otherwise); both sums are
    exact decimals, divided once at the end."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    disc_price = dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    j = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(
        F.when(F.col("p_type").like("PROMO%"), disc_price)
    ).cast("double")
    total = F.sum(disc_price).cast("double")
    return j.agg(
        F.round(F.lit(100.0) * promo / total, 6).alias("promo_revenue_pct")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: 4-way join + agg + top-20.  Scale: returnflag filter
    pushed to the lineitem scan; nation broadcasts; the limit runs as
    TakeOrderedAndProject after partial top-k, never a full sort."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    disc_price = dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money4(F.sum(disc_price)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "scalar_array_functions",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    )
    SELECT doc_id,
           len(ws) AS n_words,
           ws[1] AS first_word,
           len(list_distinct(ws)) AS n_distinct,
           array_to_string(list_sort(list_distinct(ws))[1:3], ',') AS first3_sorted,
           list_contains(ws, 'the') AS has_the
    FROM w
    """,
)
def scalar_array_functions(spark, sf_dir):
    """Array function library (size/element_at/array_distinct/array_sort/
    slice/array_join/array_contains) — all JVM expressions over a split
    column, no explode, so the row count never amplifies."""
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_words"),
        F.element_at(ws, 1).alias("first_word"),
        F.size(F.array_distinct(ws)).cast("bigint").alias("n_distinct"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(ws)), 1, 3), ","
        ).alias("first3_sorted"),
        F.array_contains(ws, "the").alias("has_the"),
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: 6-way join with a disjunctive cross-nation filter.
    Scale: both nation sides broadcast; the OR predicate evaluates after the
    joins but prunes via the two broadcasted nation filters (Catalyst pushes
    the IN-set [NATION_1, NATION_2] to each nation scan)."""
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    nations = ["NATION_1", "NATION_2"]
    n1 = F.broadcast(
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(nations))
        .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(nations))
        .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    disc_price = dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", big(F.year("l_shipdate")).alias("l_year"))
        .agg(money4(F.sum(disc_price)).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
    WITH all_orders AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                               THEN volume END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_orders GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: 7-way star join + conditional-share aggregate.
    Scale: region/nation broadcast; the EUROPE filter prunes through the
    region->nation->customer chain before the fact join."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(
        t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    volume = dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    base = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .select(
            big(F.year("o_orderdate")).alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    german = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
    ).cast("double")
    total = F.sum("volume").cast("double")
    return base.groupBy("o_year").agg(
        F.round(german / total, 6).alias("mkt_share")
    )


@query(
    "q4_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority_check(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS decorrelates to a left-semi join.  Scale: the
    date window prunes orders at the scan; the semi join shuffles only
    (orderkey, shipdate-qualifying) pairs and stops at first match."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    matched = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape (linestatus standing in for shipmode, which the
    synthetic schema lacks): fact-fact join + conditional counts.  Scale:
    the shipdate window prunes lineitem at the scan; counts are map-side
    partial sums of 0/1 expressions."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey, 0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
             AS DOUBLE) / count(*)) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem l JOIN pavg p ON l.l_partkey = p.l_partkey
    WHERE l.l_quantity < p.half_avg_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: the correlated per-part average subquery
    decorrelated into an aggregate + self-join — the rewrite Catalyst itself
    performs for correlated scalar subqueries.  Scale: one shuffle keyed by
    partkey shared by both the aggregate and the join (AQE reuses the
    exchange); no per-row subquery execution ever happens."""
    l = t(spark, sf_dir, "lineitem")
    pavg = l.groupBy("l_partkey").agg(
        (
            F.lit(0.5)
            * (F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("half_avg_qty")
    ).withColumnRenamed("l_partkey", "p_key")
    j = l.join(pavg, F.col("l_partkey") == F.col("p_key")).filter(
        F.col("l_quantity") < F.col("half_avg_qty")
    )
    return j.agg(
        F.round(F.sum(dec2("l_extendedprice")).cast("double") / 7.0, 6).alias(
            "avg_yearly"
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(CAST(o.o_totalprice AS DOUBLE), 2) AS totalprice
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN big b    ON o.o_orderkey = b.l_orderkey
    ORDER BY totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered aggregate used as a semi-filter on
    the fact join.  Scale: the big-order set is tiny after the HAVING, so
    AQE broadcasts it into the orders join; only qualifying orders reach
    the customer join."""
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            fmt_d("o_orderdate").alias("orderdate"),
            F.round(F.col("o_totalprice").cast("double"), 2).alias("totalprice"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS a
      FROM orders
    ), active AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    )
    SELECT c.c_nationkey,
           count(*) AS n_custs,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > 0
      AND c.c_custkey NOT IN (SELECT o_custkey FROM active)
    GROUP BY c.c_nationkey
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: anti-join against the recently-active-customer
    set plus a scalar filter (customers with balance but no 1998 order).  Scale: NOT IN decorrelates to a left-anti join on the
    distinct custkey set; the distinct collapses map-side first."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    active = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(active, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            money2(F.sum(dec2("c_acctbal"))).alias("total_bal"),
        )
    )


@query(
    "join_salted_skewed_fact_dim",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             upper(event_type) || '_' || CAST(length(event_type) AS VARCHAR)
               AS type_label
      FROM events
    )
    SELECT e.event_id, e.event_type, d.type_label
    FROM events e JOIN dim d ON e.event_type = d.event_type
    """,
)
def join_salted_skewed_fact_dim(spark, sf_dir):
    """Salted join for skewed keys, for when the dimension is too large to
    broadcast: the dim side is replicated across 16 salt values and the fact
    side picks a deterministic salt, so each hot key's rows spread over 16
    reducers instead of one.  Semantics are identical to the plain join (the
    oracle).  AQE's skew-join split handles moderate skew automatically;
    explicit salting is the remedy when one key dominates an entire
    partition range."""
    e = t(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn(
            "type_label",
            F.concat_ws(
                "_",
                F.upper("event_type"),
                F.length("event_type").cast("string"),
            ),
        )
    )
    n_salt = 16
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    fact_salted = e.select("event_id", "event_type").withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(n_salt))
    )
    return (
        fact_salted.hint("merge")
        .join(dim_salted, ["event_type", "salt"])
        .select("event_id", "event_type", "type_label")
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-10-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(CAST(r.total_revenue AS DOUBLE), 4) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: derived revenue view + scalar-max filter (the
    classic view-reuse query).  Scale: the revenue aggregate feeds a
    ONE-ROW max that is broadcast back onto it — two passes over the tiny
    per-supplier revenue table, zero over lineitem; the alternative
    (an unpartitioned window max) would move every supplier row to a
    single partition, which grows linearly with supplier count."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    disc_price = dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc_price).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    top = revenue.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("mx")
    )
    s = t(spark, sf_dir, "supplier")
    return s.join(top, s.s_suppkey == top.supplier_no).select(
        "s_suppkey", "s_name", money4(F.col("total_revenue")).alias("total_revenue")
    )


@query(
    "agg_argmax_order_per_customer",
    oracle="""
    SELECT o_custkey,
           (max(struct_pack(p := CAST(o_totalprice AS DECIMAL(18,2)),
                            k := o_orderkey))).k AS top_orderkey,
           round(CAST((max(struct_pack(p := CAST(o_totalprice AS DECIMAL(18,2)),
                            k := o_orderkey))).p AS DOUBLE), 2) AS top_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_argmax_order_per_customer(spark, sf_dir):
    """Argmax as a single aggregate (max over a (value, key) struct with
    lexicographic ordering) — each customer's priciest order WITHOUT a
    window: one map-side-combinable shuffle instead of a partition sort.
    Ties break on the orderkey deterministically because the key is part of
    the ordered struct."""
    o = t(spark, sf_dir, "orders")
    top = F.max(
        F.struct(dec2("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    )
    return o.groupBy("o_custkey").agg(
        top.getField("k").alias("top_orderkey"),
        money2(top.getField("p")).alias("top_price"),
    )


# ---------------------------------------------------------------------------
# TPC-H shapes Q9/Q13/Q19/Q21 (adapted: no partsupp table, so Q9's supply
# cost is modeled from p_retailprice; Q19's container terms and Q21's
# commit/receipt dates are re-expressed over columns that exist — the
# JOIN/AGG/predicate shape is what is preserved)
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                  - CAST(p.p_retailprice AS DECIMAL(18,2))
                    * CAST(l.l_quantity AS DECIMAL(18,2)) * 0.1)
                AS DOUBLE), 5) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (profit per nation-year). No partsupp table exists,
    so supply cost is modeled as 10% of p_retailprice — the five-way
    join + two-level group-by shape is what matters. Scale: part/supplier/
    nation broadcast; the LIKE filter on part prunes the fact early via
    the broadcast-join's runtime filter; one shuffle for the group-by."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    profit = (
        dec2("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        - dec2("p_retailprice") * dec2("l_quantity") * F.lit(0.1).cast("decimal(2,1)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == l.l_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            big(F.year("o_orderdate")).alias("o_year"),
        )
        # profit has exact decimal scale 5 (x.xx * x.x); round at the exact
        # scale — shallower rounding sits on .5 ties where HALF_UP (Spark)
        # and half-even (DuckDB) could disagree.
        .agg(F.round(F.sum(profit).cast("double"), 5).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left outer join with an ON-clause filter (customers
    with zero qualifying orders must survive with count 0), then a
    distribution-of-counts re-aggregation. Scale: first agg shuffles on
    custkey (same key as the join, so the exchange is reused); second
    agg's key space is tiny."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive band predicates across
    both join sides (container terms dropped — column absent). Scale: the
    brand/size half of each disjunct prunes part BEFORE the broadcast join;
    the quantity half evaluates post-join. Catalyst extracts the common
    p_partkey equi-condition so this stays a hash join, not a BNLJ."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 35) & qty.between(20, 30))
    )
    disc_price = dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(money4(F.sum(disc_price)).alias("revenue"))
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
    multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) >= 2),
    solo_late AS (
      SELECT l_orderkey FROM late
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) = 1)
    SELECT s.s_name, count(*) AS numwait
    FROM late
    JOIN multi     ON multi.l_orderkey = late.l_orderkey
    JOIN solo_late ON solo_late.l_orderkey = late.l_orderkey
    JOIN supplier s ON s.s_suppkey = late.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: the EXISTS(other supplier on the order) /
    NOT EXISTS(other LATE supplier) pair decorrelates into two aggregates
    on orderkey joined back as semi joins (commitdate/receiptdate absent,
    so 'late' = shipped >60 days after order date; finished orders only).
    Scale: every derived table shuffles on the one shared key (orderkey),
    so the co-partitioning is reused instead of re-exchanged; supplier
    broadcasts at the end."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        l.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") >= 2)
        .select(F.col("l_orderkey").alias("mk"))
    )
    solo_late = (
        late.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("nls"))
        .filter(F.col("nls") == 1)
        .select(F.col("l_orderkey").alias("sk"))
    )
    return (
        late.join(multi, late.l_orderkey == F.col("mk"), "left_semi")
        .join(solo_late, late.l_orderkey == F.col("sk"), "left_semi")
        .join(F.broadcast(s), late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 9, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_name LIKE '%7%')
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape with lineitem standing in for partsupp (the
    supplier-part relationships it records are the same).  The NOT IN
    becomes a LEFT ANTI join against the name-filtered supplier set —
    safe here because s_suppkey is non-null; a general NOT IN needs the
    null-aware variant Catalyst plans for the SQL form.  Scale: part's
    three-predicate filter prunes before its broadcast; count(DISTINCT) on
    (brand,type,size) shuffles the deduped (group, suppkey) pairs once."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 5, 9, 15, 20, 25, 30, 35)
    )
    excluded = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(excluded), l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


@query(
    "q20_excess_shippers",
    oracle="""
    SELECT s.s_name, s.s_suppkey
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%red%'
          AND l.l_shipdate >= TIMESTAMP '1998-01-01'
          AND l.l_shipdate <  TIMESTAMP '1999-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 40)
      AND s.s_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_regionkey = 1)
    ORDER BY s.s_name, s.s_suppkey
    """,
)
def q20_excess_shippers(spark, sf_dir):
    """TPC-H Q20 shape (partsupp availability -> shipped-quantity volume):
    the qualifying set comes from a per-(supplier, part) aggregate with a
    HAVING threshold, consumed as a semi join, intersected with a
    nation-filtered supplier set.  Scale: the aggregate shuffles on the
    compound key once and emits only qualifying suppkeys (tiny, so the
    semi join broadcasts); part's LIKE filter prunes its broadcast early."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    big = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec2("l_quantity")).alias("q"))
        .filter(F.col("q") > F.lit(40).cast("decimal(18,2)"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(big), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(n.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q11 shapes over a derived partsupp view.  The synthetic schema
# has no partsupp table, so both queries derive one deterministically from
# lineitem: for each observed (partkey, suppkey) pair, ps_supplycost is the
# cheapest extended price at which that supplier shipped the part and
# ps_availqty the total quantity shipped.  The derivation is expressed
# identically in the oracle SQL, so correctness is still hash-checked.
# ---------------------------------------------------------------------------

_PS_CTE = """
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost,
               sum(CAST(l_quantity AS DECIMAL(18,2)))      AS ps_availqty
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
"""


def _derived_partsupp(spark, sf_dir):
    """The shared partsupp-like view (one row per supplier-part pair)."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy(
        l.l_partkey.alias("ps_partkey"), l.l_suppkey.alias("ps_suppkey")
    ).agg(
        F.min(dec2("l_extendedprice")).alias("ps_supplycost"),
        F.sum(dec2("l_quantity")).alias("ps_availqty"),
    )


@query(
    "q2_min_cost_supplier",
    oracle=_PS_CTE
    + """
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           round(CAST(ps.ps_supplycost AS DOUBLE), 2) AS ps_supplycost
    FROM ps
    JOIN part p     ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND p.p_type LIKE 'MEDIUM%' AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
          SELECT min(ps2.ps_supplycost)
          FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
          WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier) on the derived partsupp view.
    The correlated min-cost subquery becomes a window min over ps_partkey —
    one extra shuffle on partkey instead of a self-join re-scan.  Scale:
    supplier x nation x region collapses to a broadcast dim before touching
    the big aggregate; part's size/type filter prunes its broadcast; the
    window runs on rows already reduced to one per (part, supplier)."""
    ps = _derived_partsupp(spark, sf_dir)
    eur = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & F.col("p_type").like("MEDIUM%")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ps_partkey")
    return (
        ps.join(F.broadcast(eur), ps.ps_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            money2(F.col("ps_supplycost")).alias("ps_supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle=_PS_CTE
    + """
    , val AS (
        SELECT ps.ps_partkey,
               sum(ps.ps_supplycost * ps.ps_availqty) AS value
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_9'
        GROUP BY ps.ps_partkey
    )
    SELECT ps_partkey, round(CAST(value AS DOUBLE), 4) AS part_value
    FROM val
    WHERE CAST(value AS DOUBLE) >
          (SELECT CAST(sum(value) AS DOUBLE) * 0.0001 FROM val)
    ORDER BY part_value DESC, ps_partkey
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (important stock) on the derived partsupp view:
    per-part inventory value for one nation's suppliers, kept when above a
    fraction of the national total.  The threshold is an exact decimal grand
    total cast to double once (associative, so partition order can't flip
    borderline rows).  Scale: the nation filter prunes suppliers before the
    broadcast; the tiny one-row total crosses as a scalar via crossJoin
    (broadcast NL), not a shuffle."""
    ps = _derived_partsupp(spark, sf_dir)
    sup = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    val = (
        ps.join(F.broadcast(sup), ps.ps_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_supplycost") * F.col("ps_availqty")).alias("value"))
    )
    total = val.agg(
        (F.sum("value").cast("double") * F.lit(0.0001)).alias("threshold")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("threshold"))
        .select(
            "ps_partkey", money4(F.col("value")).alias("part_value")
        )
        .orderBy(F.desc("part_value"), F.asc("ps_partkey"))
    )


@query(
    "json_variant_shred_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
)
def json_variant_shred_props(spark, sf_dir):
    """Semi-structured shredding via Spark 4's VARIANT type: parse_json once,
    then typed variant_get extraction — the open-schema path for payload
    columns whose keys evolve (vs get_json_object re-parsing the string per
    access).  At scale variant's binary encoding also shreds into parquet,
    so repeated reads skip the parse entirely."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.when(F.try_parse_json("props").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_valid"),
    ).orderBy("event_id")


@query(
    "profile_orders_table",
    oracle="""
    SELECT count(*)                                   AS n_rows,
           count(DISTINCT o_orderkey)                 AS orderkey_distinct,
           count(*) - count(o_orderkey)               AS orderkey_nulls,
           count(DISTINCT o_orderstatus)              AS status_distinct,
           min(o_orderstatus)                         AS status_min,
           max(o_orderstatus)                         AS status_max,
           round(CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS price_min,
           round(CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS price_max,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS price_sum,
           strftime(min(o_orderdate), '%Y-%m-%d')     AS date_min,
           strftime(max(o_orderdate), '%Y-%m-%d')     AS date_max
    FROM orders
    """,
)
def profile_orders_table(spark, sf_dir):
    """Single-pass column profile (the stats a pipeline records before
    ingesting a new drop): row count, per-column null/distinct counts,
    typed min/max/sum.  Scale: one scan, one partial+final aggregate; the
    two exact count(DISTINCT) columns expand to one extra shuffle each —
    swap in approx_count_distinct when cardinality only steers planning."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("orderkey_distinct"),
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("orderkey_nulls"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.min("o_orderstatus").alias("status_min"),
        F.max("o_orderstatus").alias("status_max"),
        money2(F.min(dec2("o_totalprice"))).alias("price_min"),
        money2(F.max(dec2("o_totalprice"))).alias("price_max"),
        money2(F.sum(dec2("o_totalprice"))).alias("price_sum"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("date_min"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("date_max"),
    )


@query(
    "setop_except_all_statuses",
    oracle="""
    SELECT o_orderstatus FROM (
      SELECT o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
      EXCEPT ALL
      SELECT o_orderstatus FROM orders WHERE o_orderkey % 5 = 0
    ) t ORDER BY o_orderstatus
    """,
)
def setop_except_all_statuses(spark, sf_dir):
    """Multiset EXCEPT ALL (bag difference keeps surplus duplicates —
    semantically a per-key count subtraction, which is how Spark plans it:
    one hash aggregate per side, no row-by-row anti join)."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderstatus")
    b = o.filter(F.col("o_orderkey") % 5 == 0).select("o_orderstatus")
    return a.exceptAll(b).orderBy("o_orderstatus")


@query(
    "setop_intersect_all_statuses",
    oracle="""
    SELECT o_orderstatus FROM (
      SELECT o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
      INTERSECT ALL
      SELECT o_orderstatus FROM orders WHERE o_orderkey % 5 = 0
    ) t ORDER BY o_orderstatus
    """,
)
def setop_intersect_all_statuses(spark, sf_dir):
    """Multiset INTERSECT ALL (bag intersection = per-key min of the two
    sides' multiplicities)."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderstatus")
    b = o.filter(F.col("o_orderkey") % 5 == 0).select("o_orderstatus")
    return a.intersectAll(b).orderBy("o_orderstatus")


@query(
    "agg_string_concat_nations",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def agg_string_concat_nations(spark, sf_dir):
    """Ordered string aggregation: collect_list is partition-order-dependent,
    so the engine-independent spelling is collect -> array_sort ->
    array_join (the ORDER BY inside the oracle's string_agg).  Scale: the
    sort is per-group over the collected values, never a global sort."""
    n = t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_histogram_totalprice",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           count(*)                                      AS n,
           round(CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS lo,
           round(CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS hi
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def agg_histogram_totalprice(spark, sf_dir):
    """Fixed-width histogram (50k buckets over order totals) — the
    profiling/skew-detection primitive.  Fixed bounds keep it one pass;
    a data-dependent min/max would need a second scan or a driver
    round-trip.  Bucketing is floor division, exact in both engines."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            money2(F.min(dec2("o_totalprice"))).alias("lo"),
            money2(F.max(dec2("o_totalprice"))).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "unpivot_lineitem_measures",
    oracle="""
    WITH sums AS (
      SELECT l_returnflag,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)      AS qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS price,
             round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)      AS discount,
             round(CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE), 2)           AS tax
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty' AS measure, qty AS total FROM sums
    UNION ALL SELECT l_returnflag, 'price', price FROM sums
    UNION ALL SELECT l_returnflag, 'discount', discount FROM sums
    UNION ALL SELECT l_returnflag, 'tax', tax FROM sums
    ORDER BY l_returnflag, measure
    """,
)
def unpivot_lineitem_measures(spark, sf_dir):
    """Wide-to-long reshape with the native unpivot operator (the inverse
    of pivot_status_totals_by_priority).  Scale: unpivot is a zero-shuffle
    projection (each input row fans out to k rows in place); the only
    shuffle is the upstream aggregate."""
    l = t(spark, sf_dir, "lineitem")
    sums = l.groupBy("l_returnflag").agg(
        money2(F.sum(dec2("l_quantity"))).alias("qty"),
        money2(F.sum(dec2("l_extendedprice"))).alias("price"),
        money2(F.sum(dec2("l_discount"))).alias("discount"),
        money2(F.sum(dec2("l_tax"))).alias("tax"),
    )
    return sums.unpivot(
        ["l_returnflag"],
        ["qty", "price", "discount", "tax"],
        "measure",
        "total",
    ).orderBy("l_returnflag", "measure")


@query(
    "subquery_exists_urgent_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F')
    ORDER BY c.c_custkey
    """,
)
def subquery_exists_urgent_customers(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS — planned as left-semi and left-anti
    joins (the decorrelation Catalyst applies to the SQL form, written
    directly here).  Scale: both probe sides reduce to distinct custkeys
    before joining, and AQE picks broadcast when they collapse small."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("f_custkey")
    )
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .join(finished, c.c_custkey == finished.f_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "lateral_top2_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey,
           round(CAST(t.o_totalprice AS DOUBLE), 2) AS o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey <= 500
    ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
    """,
)
def lateral_top2_orders_per_customer(spark, sf_dir):
    """LATERAL correlated subquery (top-2 orders per customer), executed
    through Spark SQL's LATERAL support so Catalyst decorrelates it into
    the window top-k plan — proof the SQL surface matches the DataFrame
    one.  Scale: decorrelation means one shuffle on custkey, not one
    subquery execution per customer row."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("xsp_lat_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("xsp_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               round(CAST(t.o_totalprice AS DOUBLE), 2) AS o_totalprice
        FROM xsp_lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM xsp_lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey <= 500
        ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
        """
    )


@query(
    "scalar_map_functions",
    oracle="""
    SELECT n_nationkey,
           map {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)}['name'][1]
             AS name_val,
           CAST(cardinality(map {'name': n_name,
                                 'region': CAST(n_regionkey AS VARCHAR)})
                AS INTEGER) AS n_keys,
           array_to_string(map_keys(map {'name': n_name,
                                         'region': CAST(n_regionkey AS VARCHAR)}),
                           ',') AS key_list
    FROM nation
    ORDER BY n_nationkey
    """,
)
def scalar_map_functions(spark, sf_dir):
    """Map-type scalar functions (construction, lookup, cardinality, key
    enumeration) — outputs are scalars so the cross-engine compare stays
    type-stable.  All JVM expressions inside codegen."""
    n = t(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.element_at(m, "name").alias("name_val"),
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("key_list"),
    ).orderBy("n_nationkey")


@query(
    "agg_mode_status_by_priority",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS mode_status, n_orders FROM (
      SELECT o_orderpriority, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_orders,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY count(*) DESC, o_orderstatus) AS rk
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ) WHERE rk = 1 ORDER BY o_orderpriority
    """,
)
def agg_mode_status_by_priority(spark, sf_dir):
    """Statistical MODE per group (most frequent order status for each
    priority), with a deterministic status tiebreak.  Spark's ``mode()``
    aggregate leaves ties implementation-ordered, so the portable form is
    count + rank — which is also the scalable form: the heavy shuffle is a
    map-side-combined count on (priority, status); the rank window then
    runs on the tiny counts table, one row per key pair."""
    o = t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("n_orders"), F.asc("o_orderstatus")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "dq_referential_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer', CAST(count(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', CAST(count(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS (
      SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'supplier->nation', CAST(count(*) AS BIGINT)
    FROM supplier s WHERE NOT EXISTS (
      SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
    ORDER BY fk
    """,
)
def dq_referential_orphans(spark, sf_dir):
    """Data-quality gate: orphan counts for each foreign-key edge of the
    schema — the referential-integrity audit a pipeline runs before
    trusting a day's ingest (all zeros on healthy TPC-H data; any nonzero
    is a broken ingest partition).

    Scale: each edge is one LEFT ANTI join on the key.  The dimension
    sides (nation, customer, orders-keys) broadcast when small; the big
    fact side streams through without materializing matches — an anti
    join is the cheapest possible existence check, no row multiplication
    ever."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")

    def orphans(fact, dim, fk, pk, label):
        return (
            fact.join(dim, fact[fk] == dim[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans(li, o, "l_orderkey", "o_orderkey", "lineitem->orders")
        .unionAll(orphans(o, c, "o_custkey", "c_custkey", "orders->customer"))
        .unionAll(orphans(c, n, "c_nationkey", "n_nationkey", "customer->nation"))
        .unionAll(orphans(s, n, "s_nationkey", "n_nationkey", "supplier->nation"))
        .orderBy("fk")
    )


@query(
    "dq_contract_orders",
    oracle="""
    SELECT 'date_in_range' AS rule,
           CAST(count(*) FILTER (WHERE o_orderdate < DATE '1995-01-01'
                                    OR o_orderdate > DATE '2002-12-31')
             AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'nonneg_totalprice',
           CAST(count(*) FILTER (WHERE o_totalprice < 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'notnull_custkey',
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'status_domain',
           CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
             AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique_orderkey',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    ORDER BY rule
    """,
)
def dq_contract_orders(spark, sf_dir):
    """Declarative data-contract gate over the orders table: one row per
    rule (domain membership, range, non-null, non-negative, key
    uniqueness) with its violation count — the check an ingest job runs
    before publishing a partition, and the complement of
    ``dq_referential_orphans`` (cross-table edges) on the single-table
    axis.  All zeros on healthy testdata (the date contract matches the
    generator's 1995..2001 span); any nonzero names the broken rule.

    Scale: ALL five rules evaluate in ONE scan — each is a conditional
    counter in the same partial aggregate (the oracle's five-scan UNION
    is the readable spec; Spark folds them into one pass) — then a 5-row
    stack/unpivot produces the report.  Adding a rule costs one more
    counter, never another scan; at 100 TB that difference is the whole
    game."""
    o = t(spark, sf_dir, "orders")
    viol = o.agg(
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1995-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("2002-12-31").cast("date")),
                1,
            ).otherwise(0)
        ).alias("date_in_range"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias(
            "nonneg_totalprice"
        ),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "notnull_custkey"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("status_domain"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "unique_orderkey"
        ),
    )
    rules = [
        "date_in_range",
        "nonneg_totalprice",
        "notnull_custkey",
        "status_domain",
        "unique_orderkey",
    ]
    stack = ", ".join(f"'{r}', {r}" for r in rules)
    return (
        viol.selectExpr(f"stack({len(rules)}, {stack}) AS (rule, n_violations)")
        .select("rule", F.col("n_violations").cast("bigint").alias("n_violations"))
        .orderBy("rule")
    )


@query(
    "dq_snapshot_diff",
    oracle="""
    WITH old_snap AS (
      SELECT doc_id, source, md5(text || '~') AS digest
      FROM documents WHERE doc_id % 97 = 0 AND doc_id % 101 <> 0
      UNION ALL
      SELECT doc_id, source, md5(text)
      FROM documents WHERE doc_id % 97 <> 0 AND doc_id % 101 <> 0
    ), new_snap AS (
      SELECT doc_id, source, md5(text) AS digest
      FROM documents WHERE doc_id % 89 <> 0
    )
    SELECT coalesce(o.source, n.source) AS source,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.digest <> n.digest THEN 'changed'
                ELSE 'unchanged' END AS change,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM old_snap o
    FULL OUTER JOIN new_snap n ON n.doc_id = o.doc_id
    GROUP BY 1, 2
    ORDER BY source, change
    """,
)
def dq_snapshot_diff(spark, sf_dir):
    """Snapshot reconciliation — the audit a recurring-crawl pipeline runs
    between two corpus versions: per source, how many documents were
    added, removed, changed, or untouched since the previous snapshot.
    The previous snapshot is derived deterministically from the corpus
    (docs with doc_id % 101 == 0 are new since then, % 89 == 0 were
    deleted, % 97 == 0 were edited — simulated by digesting text + '~'),
    so both engines reconstruct identical versions.

    Scale: the content compare uses a DIGEST projected BEFORE the join —
    each side shuffles (doc_id, source, 32-byte md5), never the document
    text, so the full-outer sort-merge join moves a fixed ~50 bytes/doc
    regardless of document size.  Classification is one CASE over the
    joined row; the report is |sources| x 4 rows.  At 100 TB this is the
    difference between shuffling 100 TB and shuffling ~50 GB."""
    d = t(spark, sf_dir, "documents")
    old_digest = F.md5(
        F.when(
            F.col("doc_id") % 97 == 0, F.concat(F.col("text"), F.lit("~"))
        ).otherwise(F.col("text"))
    )
    old = (
        d.filter(F.col("doc_id") % 101 != 0)
        .select(
            F.col("doc_id").alias("o_id"),
            F.col("source").alias("o_source"),
            old_digest.alias("o_digest"),
        )
    )
    new = d.filter(F.col("doc_id") % 89 != 0).select(
        F.col("doc_id").alias("n_id"),
        F.col("source").alias("n_source"),
        F.md5("text").alias("n_digest"),
    )
    j = old.join(new, old["o_id"] == new["n_id"], "full_outer")
    change = (
        F.when(F.col("o_id").isNull(), "added")
        .when(F.col("n_id").isNull(), "removed")
        .when(F.col("o_digest") != F.col("n_digest"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(
            F.coalesce("o_source", "n_source").alias("source"),
            change.alias("change"),
        )
        .groupBy("source", "change")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("source", "change")
    )


@query(
    "agg_approx_percentile_accuracy",
    oracle="""
    SELECT 0.5 AS quantile,
           round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 2)
             AS exact_value,
           TRUE AS rank_within_bound
    FROM orders
    UNION ALL
    SELECT 0.9,
           round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 2), TRUE
    FROM orders
    UNION ALL
    SELECT 0.99,
           round(CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE), 2), TRUE
    FROM orders
    ORDER BY quantile
    """,
)
def agg_approx_percentile_accuracy(spark, sf_dir):
    """approx_percentile (Greenwald-Khanna sketch) accuracy harness —
    the percentile SCALE path: exact interpolated percentiles need a full
    sort-or-shuffle of the column, the GK sketch is one mergeable pass.
    Like agg_approx_distinct, the estimate itself has no SQL oracle, so
    the oracle-able CONTRACT is emitted instead: per quantile, the exact
    interpolated value plus a flag that the approx value's RANK is within
    the sketch's guarantee (|rank(approx) - q*N| <= N/accuracy + 1 —
    GK's bound is on rank, not value, so this is the honest check; the
    sketch is deterministic for a given dataset, so the flag is stable).
    A driver hash mismatch means the sketch broke its own bound."""
    acc = 10_000
    o = t(spark, sf_dir, "orders")
    qs = [0.5, 0.9, 0.99]
    stats = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("o_totalprice", F.array(*[F.lit(x) for x in qs])).alias("ex"),
        F.approx_percentile(
            "o_totalprice", F.array(*[F.lit(x) for x in qs]), F.lit(acc)
        ).alias("ap"),
    )
    rows = []
    for i, qv in enumerate(qs):
        approx = F.col("ap")[i]
        # rank of the approx value: one conditional counter per quantile
        # in a SECOND scan (the 1-row sketch result broadcasts onto it);
        # two linear passes total — the exact path alone already needs a
        # full sort, so the harness stays cheaper than what it audits
        rows.append((i, qv))
    ranked = (
        o.crossJoin(F.broadcast(stats))
        .select(
            *[
                F.sum(
                    F.when(F.col("o_totalprice") <= F.col("ap")[i], 1).otherwise(0)
                ).alias(f"rank_{i}")
                for i, _ in rows
            ],
            F.first("n").alias("n"),
            F.first("ex").alias("ex"),
        )
    )
    out = ranked.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qv).alias("quantile"),
                        F.round(F.col("ex")[i], 2).alias("exact_value"),
                        (
                            F.abs(F.col(f"rank_{i}") - F.lit(qv) * F.col("n"))
                            <= F.col("n") / acc + 1
                        ).alias("rank_within_bound"),
                    )
                    for i, qv in rows
                ]
            )
        ).alias("r")
    )
    return out.select("r.quantile", "r.exact_value", "r.rank_within_bound").orderBy(
        "quantile"
    )
