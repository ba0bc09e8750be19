"""Beyond-parity relational operators: joins (broadcast + shuffle),
windows, set ops, rollup/pivot, as-of, salted aggregation.

The reference has zero joins/windows/set-ops (SURVEY §2.3/2.7/2.8);
these extend the engine to the full relational surface a payroll
analytics engine needs at 100 TB. Scale notes on each operator.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from city_payroll_data_pipeline_spark.functions.sketches import (
    hll_bucket_rho,
    hll_estimate,
)
from city_payroll_data_pipeline_spark.suite import Query, table
from city_payroll_data_pipeline_spark.suite.parity import (
    _dec_sum,
    _sql_dec_sum,
    _sql_round,
)

# --------------------------------------------------------------------------
# Joins — dimension joins broadcast (region/nation/customer are tiny
# relative to facts; broadcast avoids shuffling the 100 TB side), the
# orders⋈customer join shuffles on the key and AQE handles skew.
# --------------------------------------------------------------------------

def q_region_revenue(spark, sf_dir):
    """Revenue by region/nation: fact⋈dim⋈dim⋈dim. nation/region are
    fixed-cardinality (25/5 rows at every SF) and carry explicit
    broadcast hints; customer SCALES with SF, so it gets no hint —
    the size-based planner/AQE broadcasts it at test scale (plan shows
    BroadcastHashJoin) and falls back to a custkey shuffle join at
    100 TB instead of OOMing executors."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "revenue"),
        )
        .orderBy("region", "nation")
    )


REGION_REVENUE_SQL = f"""
SELECT r_name AS region, n_name AS nation,
       COUNT(*) AS n_orders,
       {_sql_dec_sum('o_totalprice', 'revenue')}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY region, nation
"""


def q_order_lineitem_join(spark, sf_dir):
    """Fact⋈fact shuffle join (both sides large at scale): lineitem ⋈
    orders on orderkey. At 100 TB both sides hash-shuffle on the key —
    co-partitioning via bucketing on l_orderkey/o_orderkey would
    eliminate it (see sinks.save_table bucketing support)."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            ),
        )
        .orderBy("o_orderpriority")
    )


ORDER_LINEITEM_JOIN_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       {_sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue', 6)}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_customers_without_orders(spark, sf_dir):
    """Anti join (NOT EXISTS): customers who never ordered. left_anti
    avoids materializing the join — at scale this is a broadcast or
    shuffled existence check, never a row blowup."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def q_customers_with_orders_semi(spark, sf_dir):
    """Semi join (EXISTS): distinct customers that ordered, without
    duplicating customer rows per order."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


CUSTOMERS_WITH_ORDERS_SEMI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

# --------------------------------------------------------------------------
# TPC-H Q1-style pricing summary — the canonical partial-agg workload
# --------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_disc_price",
                scale=6,
            ),
            _dec_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                "sum_charge",
                scale=6,
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dec_sum('l_quantity', 'sum_qty')},
       {_sql_dec_sum('l_extendedprice', 'sum_base_price')},
       {_sql_dec_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price', 6)},
       {_sql_dec_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge', 6)},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------------
# Window functions — rank-per-group and running totals. Shuffles once on
# the partition key; within-partition sort is local.
# --------------------------------------------------------------------------

def q_top_orders_per_priority(spark, sf_dir):
    """row_number over (priority, totalprice desc) — top-3 orders per
    priority class. Total ordering via the orderkey tiebreak keeps the
    result deterministic across engines/partitionings."""
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_priority", F.row_number().over(w))
        .filter(F.col("rank_in_priority") <= 3)
        .select("o_orderpriority", "rank_in_priority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rank_in_priority")
    )


TOP_ORDERS_PER_PRIORITY_SQL = """
SELECT o_orderpriority, rank_in_priority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rank_in_priority
  FROM orders
)
WHERE rank_in_priority <= 3
ORDER BY o_orderpriority, rank_in_priority
"""


def q_user_running_value(spark, sf_dir):
    """Running per-user cumulative value over event time. Even with a
    total window order, engines may associate the float additions
    differently (DuckDB uses segment-tree window aggregation), so the
    running sum also routes through exact decimal."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    ).orderBy("user_id", "event_id")


USER_RUNNING_VALUE_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value
FROM events
ORDER BY user_id, event_id
"""


def q_event_sessionize_asof(spark, sf_dir):
    """As-of style carry-forward: for every event, the timestamp of the
    user's most recent 'login'-class event ('view') at or before it.
    Composition of built-in window ops (last value, ignore nulls) —
    no UDF; DuckDB expresses the same with IGNORE NULLS."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.last(
            F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_view_ts"),
    ).orderBy("user_id", "event_id")


EVENT_SESSIONIZE_ASOF_SQL = """
SELECT user_id, event_id, event_type,
       LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
FROM events
ORDER BY user_id, event_id
"""

def q_conditional_agg_mix(spark, sf_dir):
    """Conditional aggregation (SQL FILTER clause / count_if): several
    differently-filtered aggregates in ONE pass over the fact — the
    pattern that replaces N separate filtered scans with one."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.count_if(F.col("o_totalprice") > 100000).alias("n_large"),
            _dec_sum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(
                    F.lit(0.0)
                ),
                "finished_revenue",
            ),
        )
        .orderBy("o_orderpriority")
    )


CONDITIONAL_AGG_MIX_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (o_totalprice > 100000) AS n_large,
       {_sql_dec_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END", 'finished_revenue')}
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_orders_by_month(spark, sf_dir):
    """Date-part extraction (year/month/quarter/day-of-week) feeding a
    calendar aggregation."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.month("o_orderdate").alias("mon"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.count_if(F.dayofweek("o_orderdate") == 1).alias("n_sunday"),
            _dec_sum(F.col("o_totalprice"), "revenue"),
        )
        .orderBy("yr", "qtr", "mon")
    )


ORDERS_BY_MONTH_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(month(o_orderdate) AS INT) AS mon,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (dayofweek(o_orderdate) = 0) AS n_sunday,
       {_sql_dec_sum('o_totalprice', 'revenue')}
FROM orders
GROUP BY 1, 2, 3
ORDER BY yr, qtr, mon
"""


def q_string_formatting(spark, sf_dir):
    """String-function surface: upper/lower, substring, length, lpad,
    concat_ws, replace — projected over the customer dimension."""
    customer = table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 4).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.concat_ws("|", "c_mktsegment", F.lower("c_name")).alias("seg_name"),
        F.regexp_replace("c_name", "[aeiou]", "_").alias("devoweled"),
    )


STRING_FORMATTING_SQL = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       substr(c_name, 1, 4) AS name_prefix,
       length(c_name) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
       -- concat_ws, not ||: Spark's concat_ws skips NULL args
       -- while || yields NULL if either side is NULL
       concat_ws('|', c_mktsegment, lower(c_name)) AS seg_name,
       regexp_replace(c_name, '[aeiou]', '_', 'g') AS devoweled
FROM customer
"""


def q_status_sets_by_priority(spark, sf_dir):
    """Set-valued aggregation rendered deterministically: the distinct
    statuses per priority as a sorted comma-joined string (array
    column order is engine-dependent; the sorted join is the
    hash-stable form)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderstatus")), ","
            ).alias("statuses"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


STATUS_SETS_BY_PRIORITY_SQL = """
SELECT o_orderpriority,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
       COUNT(DISTINCT o_orderstatus) AS n_statuses
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_customer_order_windows(spark, sf_dir):
    """The remaining analytic-window surface in one query: lag (days
    since previous order), lead (next order key), ntile quartiles, and
    a 30-day RANGE frame (trailing spend) — all over ONE shuffle on
    o_custkey; every function shares the same partition sort."""
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    secs = F.unix_timestamp(F.col("o_orderdate"))
    wr = (
        W.partitionBy("o_custkey")
        .orderBy(secs)
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.ntile(4).over(w).alias("order_quartile"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(wr)
        .cast("double")
        .alias("trailing_30d_spend"),
    ).orderBy("o_custkey", "o_orderkey")


CUSTOMER_ORDER_WINDOWS_SQL = """
SELECT o_custkey, o_orderkey,
       date_diff('day', lag(o_orderdate) OVER w, o_orderdate)
         AS days_since_prev,
       lead(o_orderkey) OVER w AS next_orderkey,
       ntile(4) OVER w AS order_quartile,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing_30d_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""

# --------------------------------------------------------------------------
# Time-bucketed aggregation (the batch analog of a streaming tumbling
# window; the streaming module reuses the same expression)
# --------------------------------------------------------------------------

def q_hourly_event_stats(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum(F.col("value"), "total_value"),
        )
        .orderBy("hour", "event_type")
    )


HOURLY_EVENT_STATS_SQL = f"""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
       COUNT(*) AS n_events,
       {_sql_dec_sum('value', 'total_value')}
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""

# --------------------------------------------------------------------------
# Set operations (SURVEY §2.7 — absent in reference)
# --------------------------------------------------------------------------

def q_set_ops_customers(spark, sf_dir):
    """UNION/INTERSECT/EXCEPT over early vs late purchasers."""
    orders = table(spark, sf_dir, "orders")
    early = orders.filter(F.year("o_orderdate") <= 1996).select("o_custkey")
    late = orders.filter(F.year("o_orderdate") >= 1999).select("o_custkey")
    both = early.intersect(late).withColumn("cohort", F.lit("both"))
    only_early = early.distinct().exceptAll(late.distinct()).withColumn(
        "cohort", F.lit("early_only")
    )
    only_late = late.distinct().exceptAll(early.distinct()).withColumn(
        "cohort", F.lit("late_only")
    )
    return (
        both.union(only_early)
        .union(only_late)
        .groupBy("cohort")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("cohort")
    )


SET_OPS_CUSTOMERS_SQL = """
WITH early AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) <= 1996),
     late  AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) >= 1999),
     tagged AS (
       SELECT o_custkey, 'both' AS cohort FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
       UNION ALL
       SELECT o_custkey, 'early_only' FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
       UNION ALL
       SELECT o_custkey, 'late_only' FROM (SELECT * FROM late EXCEPT SELECT * FROM early)
     )
SELECT cohort, COUNT(*) AS n_customers FROM tagged GROUP BY cohort ORDER BY cohort
"""

# --------------------------------------------------------------------------
# ROLLUP + pivot
# --------------------------------------------------------------------------

def q_rollup_priority_status(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "revenue"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderpriority"), F.asc_nulls_first("o_orderstatus")
        )
    )


ROLLUP_PRIORITY_STATUS_SQL = f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {_sql_dec_sum('o_totalprice', 'revenue')}
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


def q_pivot_status_by_priority(spark, sf_dir):
    """Pivot order status into columns (explicit value list — at scale
    an unbounded pivot needs a distinct-values pass; pinning the values
    keeps it one job)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("o_orderpriority")
    )


PIVOT_STATUS_BY_PRIORITY_SQL = """
SELECT o_orderpriority,
       COALESCE(COUNT(*) FILTER (o_orderstatus = 'O'), 0) AS "O",
       COALESCE(COUNT(*) FILTER (o_orderstatus = 'F'), 0) AS "F",
       COALESCE(COUNT(*) FILTER (o_orderstatus = 'P'), 0) AS "P"
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# --------------------------------------------------------------------------
# Distinct aggregation + skew-resistant salted aggregation
# --------------------------------------------------------------------------

def q_distinct_counts(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey", "l_partkey").alias("n_supp_part_pairs"),
    )


DISTINCT_COUNTS_SQL = """
SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey) AS n_parts,
       -- Spark's countDistinct(a, b) skips rows where EITHER is
       -- NULL; DuckDB's row-tuple DISTINCT would count them
       COUNT(DISTINCT (l_suppkey, l_partkey))
         FILTER (l_suppkey IS NOT NULL AND l_partkey IS NOT NULL)
         AS n_supp_part_pairs
FROM lineitem
"""


def q_order_lineitem_join_salted(spark, sf_dir):
    """The fact-fact join of order_lineitem_join executed through the
    explicit salted join (operators/skew.py): the orders side is
    replicated per salt, lineitem's hot orderkeys spread n ways. Salt
    never reaches the output, so this shares the plain join's oracle —
    the cross-check that salting changes placement, not results."""
    from city_payroll_data_pipeline_spark.operators.skew import salted_join

    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            ),
        )
        .orderBy("o_orderpriority")
    )


def q_budget_report_salted(spark, sf_dir):
    """Same result as the budget report, computed skew-resistant: a
    two-stage salted aggregation (key+salt partial agg → key final
    agg). At 100 TB a single hot job_title melts one reducer; salting
    spreads the partial aggregation across `n_salts` tasks. Decimal
    partials re-aggregate exactly, so the result is bit-identical to
    the direct plan (same oracle as budget_report).
    """
    n_salts = 16
    orders = table(spark, sf_dir, "orders")
    partial = (
        orders.withColumn(
            "_salt", (F.col("o_orderkey") % n_salts).cast("int")
        )
        .groupBy(F.col("o_orderpriority").alias("job_title"), "_salt")
        .agg(
            F.count("*").alias("_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_sum"),
        )
    )
    return (
        partial.groupBy("job_title")
        .agg(
            F.sum("_cnt").alias("total_employee"),
            F.sum("_sum").cast("double").alias("total_budget"),
        )
        .orderBy(F.desc("total_budget"))
    )


# --------------------------------------------------------------------------
# CUBE + GROUPING SETS (full multi-dimensional agg surface; rollup above)
# --------------------------------------------------------------------------

def q_cube_priority_status(spark, sf_dir):
    """CUBE over (priority, status): all 4 grouping combinations in one
    pass. Spark expands the cube map-side (one shuffle, grouping-id
    tagged rows) — no per-combination rescan of the 100 TB fact."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "revenue"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderpriority"), F.asc_nulls_first("o_orderstatus")
        )
    )


CUBE_PRIORITY_STATUS_SQL = f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {_sql_dec_sum('o_totalprice', 'revenue')}
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


def q_grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS — (priority), (status), grand total —
    a set combination neither rollup nor cube expresses."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [[F.col("o_orderpriority")], [F.col("o_orderstatus")], []],
            F.col("o_orderpriority"),
            F.col("o_orderstatus"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "revenue"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderpriority"), F.asc_nulls_first("o_orderstatus")
        )
    )


GROUPING_SETS_REVENUE_SQL = f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {_sql_dec_sum('o_totalprice', 'revenue')}
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""

# --------------------------------------------------------------------------
# Exact group percentiles (reference KPI layer uses exact median —
# SURVEY §2.4 A6; here generalized per-group and to p90)
# --------------------------------------------------------------------------

def q_group_percentiles(spark, sf_dir):
    """Exact median + p90 of extended price per returnflag. Exact
    percentile needs the group's values together (sort-based agg) — at
    100 TB prefer approx_percentile for dashboards; the exact form
    stays for audit paths. Both engines interpolate at p·(n-1); one
    6-dp round absorbs last-ulp association differences."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.median("l_extendedprice"), 6).alias("median_price"),
            F.round(F.percentile("l_extendedprice", 0.9), 6).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


GROUP_PERCENTILES_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       {_sql_round('median(l_extendedprice)', 6)} AS median_price,
       {_sql_round('quantile_cont(l_extendedprice, 0.9)', 6)} AS p90_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# --------------------------------------------------------------------------
# Range join (band lookup) — the non-equi join Spark lacks a hash path
# for; tiny band table → broadcast nested loop stays O(n·bands)
# --------------------------------------------------------------------------

PRICE_BANDS = [
    ("penny", 0.0, 1000.0),
    ("low", 1000.0, 5000.0),
    ("mid", 5000.0, 20000.0),
    ("high", 20000.0, 50000.0),
    ("lux", 50000.0, 1.0e9),
]


def q_price_band_range_join(spark, sf_dir):
    """Non-uniform price-band classification via a range join
    (lo <= price < hi). The band table is broadcast, so the fact side
    streams through a BroadcastNestedLoopJoin — no shuffle, no sort.
    With a large band table this becomes bucketize-then-equi-join;
    with bands this small the nested loop is strictly cheaper."""
    li = table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_lines"),
            _dec_sum(F.col("l_extendedprice"), "total_price"),
        )
        .orderBy("band")
    )


_BANDS_VALUES = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)

PRICE_BAND_RANGE_JOIN_SQL = f"""
WITH bands(band, lo, hi) AS (VALUES {_BANDS_VALUES})
SELECT band,
       COUNT(*) AS n_lines,
       {_sql_dec_sum('l_extendedprice', 'total_price')}
FROM lineitem JOIN bands
  ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY band
ORDER BY band
"""

# --------------------------------------------------------------------------
# TPC-H Q3-style shipping priority: 3-way join, filters on every input,
# top-k by aggregated revenue
# --------------------------------------------------------------------------

def q_shipping_priority_topk(spark, sf_dir):
    """customer(BUILDING) ⋈ orders(date<cut) ⋈ lineitem(ship>cut) →
    revenue per order → top 10. Filters sit directly on each scan
    (pushed to parquet), customer is semi-join-reduced before the fact
    join, and the final top-k is TakeOrderedAndProject (no global
    sort materialization)."""
    cut = F.lit("1999-01-01").cast("timestamp")
    customer = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey, "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SHIPPING_PRIORITY_TOPK_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {_sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue', 6)}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Two-table as-of join (events ⟶ latest order per user at event time).
# Oracle: DuckDB's native ASOF LEFT JOIN — a strong cross-engine check
# of the union+window encoding in operators/asof.py.
# --------------------------------------------------------------------------

def q_events_asof_last_order(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators.asof import asof_join_backward

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # reduce orders to one row per (custkey, date) — the asof_join
    # determinism contract (ties are engine-defined otherwise)
    orders = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    joined = asof_join_backward(
        ev, orders, by="user_id", left_ts="ts", right_ts="o_orderdate",
        payload=["last_orderkey"],
    )
    return joined.select("event_id", "user_id", "last_orderkey")


EVENTS_ASOF_LAST_ORDER_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, r.last_orderkey
FROM events e
ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""


# --------------------------------------------------------------------------
# Forward as-of with tolerance (operators/asof.py::asof_join_forward —
# pandas merge_asof(direction='forward', tolerance=30d) parity, which
# neither Spark nor plain SQL has natively): for every event, the
# customer's NEXT order within 30 days — the "did the touchpoint
# convert, and how fast" attribution primitive. Same one-exchange
# union+window encoding as the backward join (no range-join blowup);
# the tolerance nulls the carry exactly (the earliest forward match
# already too late ⇒ all are). Nullable longs become float64 in BOTH
# engines' pandas bridges inconsistently, so no-match rows carry -1
# sentinels to keep the output exact-integer.
# --------------------------------------------------------------------------


def q_events_asof_next_order(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators.asof import (
        asof_join_forward,
    )

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("next_orderkey"))
    )
    joined = asof_join_forward(
        ev,
        orders,
        by="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["next_orderkey"],
        tolerance="INTERVAL 30 DAYS",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.coalesce("next_orderkey", F.lit(-1)).alias("next_orderkey"),
        F.coalesce(
            F.datediff(
                F.col("_asof_matched_ts").cast("date"),
                F.col("ts").cast("date"),
            ).cast("long"),
            F.lit(-1),
        ).alias("days_to_order"),
    )


EVENTS_ASOF_NEXT_ORDER_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS next_orderkey
  FROM orders GROUP BY 1, 2
),
m AS (
  SELECT e.event_id, min(r.o_orderdate) AS nd
  FROM events e
  JOIN r ON e.user_id = r.o_custkey
        AND r.o_orderdate >= e.ts
        AND r.o_orderdate <= e.ts + INTERVAL 30 DAY
  GROUP BY 1
)
SELECT e.event_id, e.user_id,
       COALESCE(r.next_orderkey, -1) AS next_orderkey,
       CAST(COALESCE(
         date_diff('day', CAST(e.ts AS DATE), CAST(m.nd AS DATE)), -1
       ) AS BIGINT) AS days_to_order
FROM events e
LEFT JOIN m ON m.event_id = e.event_id
LEFT JOIN r ON r.o_custkey = e.user_id AND r.o_orderdate = m.nd
"""


# --------------------------------------------------------------------------
# Gaps-and-islands interval union (the classic interval-merge op SQL
# engines make you hand-roll): per customer, merge overlapping order
# fulfillment intervals [o_orderdate, last l_shipdate of the order]
# into busy episodes; report episode count, distinct covered days and
# utilization of the customer's active span. Sweep-line via running
# max of interval ends — island starts where the next interval begins
# past everything seen. Tie rows are flag-symmetric, so the result is
# partition/order-stable; everything is integer dates until the one
# final division.
#
# Scale: one orderkey groupBy (shipdate reduce), one orders join on
# its key, then per-customer windows bounded by orders-per-customer;
# no range join, no self-join — |orders| rows through each exchange.
# --------------------------------------------------------------------------


def q_fulfillment_islands(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("o_orderkey")
    ).agg(F.max(F.col("l_shipdate").cast("date")).alias("end_d"))
    iv = (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("start_d"),
        )
        .join(li, "o_orderkey")
    )
    w = W.partitionBy("o_custkey").orderBy("start_d", "end_d", "o_orderkey")
    prev_max = F.max("end_d").over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "o_custkey",
        "start_d",
        "end_d",
        "o_orderkey",
        F.when(
            prev_max.isNull() | (F.col("start_d") > prev_max), 1
        ).otherwise(0).alias("new_island"),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    islands = flagged.groupBy("o_custkey", "island").agg(
        F.min("start_d").alias("i_start"),
        F.max("end_d").alias("i_end"),
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_episodes"),
            F.sum(
                F.datediff("i_end", "i_start").cast("long") + 1
            ).alias("covered_days"),
            (
                F.datediff(F.max("i_end"), F.min("i_start")).cast("long") + 1
            ).alias("span_days"),
        )
        .select(
            "o_custkey",
            "n_episodes",
            "covered_days",
            "span_days",
            F.round(
                F.col("covered_days").cast("double")
                / F.col("span_days").cast("double"),
                6,
            ).alias("utilization"),
        )
        .orderBy("o_custkey")
    )


FULFILLMENT_ISLANDS_SQL = f"""
WITH li AS (
  SELECT l_orderkey AS o_orderkey, CAST(max(l_shipdate) AS DATE) AS end_d
  FROM lineitem GROUP BY 1
),
iv AS (
  SELECT o.o_custkey, CAST(o.o_orderdate AS DATE) AS start_d, li.end_d,
         o.o_orderkey
  FROM orders o JOIN li USING (o_orderkey)
),
flagged AS (
  SELECT o_custkey, start_d, end_d,
         CASE WHEN max(end_d) OVER (
                PARTITION BY o_custkey
                ORDER BY start_d, end_d, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR start_d > max(end_d) OVER (
                PARTITION BY o_custkey
                ORDER BY start_d, end_d, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
         THEN 1 ELSE 0 END AS new_island,
         o_orderkey
  FROM iv
),
numbered AS (
  SELECT o_custkey, start_d, end_d,
         SUM(new_island) OVER (
           PARTITION BY o_custkey
           ORDER BY start_d, end_d, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island
  FROM flagged
),
islands AS (
  SELECT o_custkey, island,
         min(start_d) AS i_start, max(end_d) AS i_end
  FROM numbered GROUP BY 1, 2
)
SELECT o_custkey,
       COUNT(*) AS n_episodes,
       CAST(SUM(date_diff('day', i_start, i_end) + 1) AS BIGINT)
         AS covered_days,
       CAST(date_diff('day', min(i_start), max(i_end)) + 1 AS BIGINT)
         AS span_days,
       {_sql_round(
           "CAST(SUM(date_diff('day', i_start, i_end) + 1) AS DOUBLE)"
           " / CAST(date_diff('day', min(i_start), max(i_end)) + 1"
           " AS DOUBLE)",
           6,
       )} AS utilization
FROM islands
GROUP BY o_custkey
ORDER BY o_custkey
"""

# --------------------------------------------------------------------------
# Multi-resolution time rollup (hypertable-style continuous-aggregate
# shape: hour + day + grand total in ONE scan via grouping sets)
# --------------------------------------------------------------------------

def q_time_rollup_multires(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    return (
        base.groupingSets(
            [[F.col("day"), F.col("hour")], [F.col("day")], []],
            F.col("day"),
            F.col("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum(F.col("value"), "total_value"),
        )
        .orderBy(F.asc_nulls_first("day"), F.asc_nulls_first("hour"))
    )


TIME_ROLLUP_MULTIRES_SQL = f"""
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
       COUNT(*) AS n_events,
       {_sql_dec_sum('value', 'total_value')}
FROM events
GROUP BY GROUPING SETS ((1, 2), (1), ())
ORDER BY day ASC NULLS FIRST, hour ASC NULLS FIRST
"""

# --------------------------------------------------------------------------
# Approximate sketches (HLL distinct) next to the exact answers.
#
# Graduated from a rows-only check to a full register-level oracle
# (VERDICT r5 item 6): instead of Spark's engine-specific
# approx_count_distinct (HLL++ register layout not replayable in
# DuckDB), the estimates come from the repo's hand-rolled p=12 HLL
# (functions/sketches.py — the same md5 bucket/rho derivation the
# streaming register job proved bit-identical across engines), so the
# DuckDB oracle replays every register and hash-matches the estimate.
#
# Scale: the approx path is one map-side partial-max pass into a
# fixed 4096-register frame per column — duplicates never survive the
# mapper; exact distinct (kept only to certify the error) shuffles
# every distinct value.
# --------------------------------------------------------------------------

def _hll_card_est(df, key, out):
    """One-row frame with the 4-dp p=12 HLL estimate of ``key``."""
    b, rho = hll_bucket_rho(F.col(key))
    regs = (
        df.select(b.alias("b"), rho.alias("rho"))
        .groupBy("b")
        .agg(F.max("rho").alias("m_j"))
    )
    per = regs.agg(
        F.count("*").alias("v_obs"),
        F.sum(F.expr("shiftleft(1L, 49 - m_j)")).alias("s_obs"),
    )
    return per.select(
        F.round(hll_estimate(F.col("v_obs"), F.col("s_obs")), 4).alias(out)
    )


def q_approx_distinct_stats(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    ao = _hll_card_est(li, "l_orderkey", "approx_orders")
    ap = _hll_card_est(li, "l_partkey", "approx_parts")
    return ao.crossJoin(ap).crossJoin(exact).select(
        "approx_orders", "exact_orders", "approx_parts", "exact_parts"
    )


def _hll_est_sql_ctes(tag: str, src: str, key: str) -> str:
    """CTE chain ``{tag}_e`` holding the scalar p=12 HLL estimate of
    ``key`` in ``src`` — the DuckDB replay of _hll_card_est, register
    math identical to suite/mlops.py::_hll_sql."""
    from city_payroll_data_pipeline_spark.functions.sketches import (
        HLL_ALPHA,
        HLL_C49,
        HLL_M,
    )

    return f"""
{tag}_h AS (
  SELECT CAST('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 3) AS INT) AS b,
         CAST('0x' || substr(md5(CAST({key} AS VARCHAR)), 4, 12) AS BIGINT)
           AS v48
  FROM {src}
),
{tag}_r AS (
  SELECT b,
         MAX(CASE WHEN v48 = 0 THEN 49 ELSE 49 - length(bin(v48)) END) AS m_j
  FROM {tag}_h GROUP BY b
),
{tag}_p AS (
  SELECT COUNT(*) AS v_obs,
         CAST(SUM(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT) AS s_obs
  FROM {tag}_r
),
{tag}_e AS (
  SELECT CASE WHEN raw <= 2.5 * {HLL_M} AND v_empty > 0
              THEN {HLL_M} * {_sql_round(
                  f'ln(CAST({HLL_M} AS DOUBLE) / CAST(v_empty AS DOUBLE))', 8
              )}
              ELSE raw END AS est
  FROM (
    SELECT CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}
             * (CAST({HLL_C49} AS DOUBLE)
                / CAST(s_obs + ({HLL_M} - v_obs)
                               * CAST({HLL_C49} AS BIGINT) AS DOUBLE)) AS raw,
           {HLL_M} - v_obs AS v_empty
    FROM {tag}_p
  )
)"""


def _approx_distinct_stats_sql() -> str:
    return f"""
WITH {_hll_est_sql_ctes('ord', 'lineitem', 'l_orderkey')},
{_hll_est_sql_ctes('prt', 'lineitem', 'l_partkey')},
exact AS (
  SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
         COUNT(DISTINCT l_partkey) AS exact_parts
  FROM lineitem
)
SELECT {_sql_round('ord_e.est', 4)} AS approx_orders,
       exact_orders,
       {_sql_round('prt_e.est', 4)} AS approx_parts,
       exact_parts
FROM ord_e, prt_e, exact
"""


# --------------------------------------------------------------------------
# Gap-based sessionization (batch twin of streaming/sessionize.py)
# --------------------------------------------------------------------------

def q_event_sessions(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators.sessions import session_stats

    ev = table(spark, sf_dir, "events")
    return session_stats(ev, gap_seconds=3600).orderBy("user_id", "session_id")


EVENT_SESSIONS_SQL = """
WITH secs AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
),
flagged AS (
  SELECT user_id, s, event_id,
         CASE WHEN lag(s) OVER w IS NULL
                OR s - lag(s) OVER w > 3600 THEN 1 ELSE 0 END AS new_session
  FROM secs
  WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
),
numbered AS (
  -- event_id tiebreak matches Spark's assign_sessions window: ORDER BY
  -- s alone leaves same-second rows in engine-dependent order, and a
  -- tie straddling a session boundary could attach a row to the
  -- PREVIOUS session (a real same-second-after-gap pair exists at
  -- sf0.1)
  SELECT user_id, s,
         CAST(SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MAX(s) - MIN(s) AS duration_s
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""

# --------------------------------------------------------------------------
# session_overlap_pairs — which sessions ran CONCURRENTLY across
# users: the interval-overlap ϴ-join, decomposed into the bucketed
# equi-join + containing-bucket dedup shape (operators/intervals.py
# has the scale analysis — the naive predicate join is quadratic and
# plans as a nested loop; this shuffles on a bucket KEY instead).
# Corpus analogy: co-occurring crawl/ingest windows, media segments
# overlapping in time, conflicting pipeline maintenance windows.
# --------------------------------------------------------------------------

_OVERLAP_BUCKET_S = 3600
# ≥2 events: singleton "sessions" are zero-length points that would
# dominate the pair count with degenerate 0-second overlaps; ≥5 would
# leave ZERO qualifying sessions at sf0.01 — the driver's correctness
# SF — making the hash check vacuous (measured: 0/784/9147 sessions
# at thresholds 5/2/1).
_OVERLAP_MIN_EVENTS = 2


def q_session_overlap_pairs(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators.intervals import (
        bucketed_overlap_join,
    )
    from city_payroll_data_pipeline_spark.operators.sessions import (
        assign_sessions,
    )

    ev = table(spark, sf_dir, "events")
    secs = F.unix_timestamp(F.col("ts"))
    sess = (
        assign_sessions(ev, gap_seconds=3600)
        .groupBy("user_id", "session_id")
        .agg(
            F.min(secs).alias("s_start"),
            F.max(secs).alias("s_end"),
            F.count("*").alias("n_events"),
        )
        .filter(F.col("n_events") >= _OVERLAP_MIN_EVENTS)
        # both join sides re-derive from this frame; checkpoint so the
        # sessionization window runs once
        .localCheckpoint(eager=True)
    )
    a = sess.select(
        F.col("user_id").alias("user_a"),
        F.col("session_id").alias("session_a"),
        F.col("s_start").alias("a_start"),
        F.col("s_end").alias("a_end"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"),
        F.col("session_id").alias("session_b"),
        F.col("s_start").alias("b_start"),
        F.col("s_end").alias("b_end"),
    )
    pairs = bucketed_overlap_join(
        a,
        b,
        "a_start",
        "a_end",
        "b_start",
        "b_end",
        pred=F.col("user_a") < F.col("user_b"),
        bucket_width=_OVERLAP_BUCKET_S,
    )
    return (
        pairs.select(
            "user_a", "session_a", "user_b", "session_b", "overlap_s"
        )
        .orderBy(
            F.desc("overlap_s"), "user_a", "session_a", "user_b", "session_b"
        )
        .limit(20)
    )


SESSION_OVERLAP_PAIRS_SQL = f"""
WITH secs AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
),
flagged AS (
  SELECT user_id, s, event_id,
         CASE WHEN lag(s) OVER w IS NULL
                OR s - lag(s) OVER w > 3600 THEN 1 ELSE 0 END AS new_session
  FROM secs
  WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
),
numbered AS (
  SELECT user_id, s,
         CAST(SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS session_id
  FROM flagged
),
sess AS MATERIALIZED (
  SELECT user_id, session_id,
         MIN(s) AS s_start, MAX(s) AS s_end
  FROM numbered
  GROUP BY user_id, session_id
  HAVING COUNT(*) >= {_OVERLAP_MIN_EVENTS}
)
SELECT a.user_id AS user_a, a.session_id AS session_a,
       b.user_id AS user_b, b.session_id AS session_b,
       LEAST(a.s_end, b.s_end) - GREATEST(a.s_start, b.s_start) AS overlap_s
FROM sess a JOIN sess b
  ON a.user_id < b.user_id
 AND a.s_start <= b.s_end AND b.s_start <= a.s_end
ORDER BY overlap_s DESC, user_a, session_a, user_b, session_b
LIMIT 20
"""


# --------------------------------------------------------------------------
# watermark_lateness_audit — how out-of-order does each feed ARRIVE,
# i.e. what watermark do the streaming jobs actually need? An event is
# LATE by (max event-time seen so far in arrival order) − (its own
# event time); the per-type maximum is the tightest watermark that
# loses nothing, and late_share/mean say how much a smaller one would
# drop. This is the batch measurement that configures
# streaming/jobs.py's `watermark` parameters — set by measurement
# instead of folklore.
#
# Arrival model: the testdata files are stored in perfect event-time
# order (every feed would read lateness 0 — a vacuous audit), so the
# audit replays the arrival pattern real ingest produces: a K-shard
# round-robin merge (shard = user_id % K, each shard internally
# time-ordered — exactly how per-shard files interleave at the
# consumer). Disorder is then the genuine cross-shard event-time skew
# at equal sequence positions.
#
# Scale: one shuffle on (event_type, shard) for the sequence numbers.
# The arrival-order running max is NOT a per-type global window —
# event_type is low-cardinality, so `W.partitionBy("event_type")`
# would funnel every event of a type through ONE reducer (the exact
# pathology operators/rowids.py exists to avoid). Instead it uses the
# same prefix-carry shape as `stable_row_ids`: arrival order is
# (seq, shard) lexicographic and the chunk id derives from seq alone,
# so chunks are contiguous prefixes of arrival order. The running max
# is computed per (event_type, chunk) in parallel, each chunk's max is
# prefix-maxed over the TINY per-type chunk frame (rows = corpus /
# (_LATE_CHUNK · shards-per-seq), model-sized), and the carry rides
# back on a broadcast join: greatest(within-chunk running max, carry
# from all earlier chunks) is bit-identical to the global running max.
# Largest sort = one chunk (≤ _LATE_CHUNK · _LATE_SHARDS rows), not
# one event type. _LATE_CHUNK is sized small here so sf0.01 exercises
# multiple chunks per type; at 100 TB you'd raise it (~1e6) so the
# carry frame stays thousands of rows.
# --------------------------------------------------------------------------

_LATE_SHARDS = 4
_LATE_CHUNK = 128  # arrival-sequence positions per prefix-carry chunk


def q_watermark_lateness_audit(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    secs = F.unix_timestamp(F.col("ts"))
    shard = (F.col("user_id") % _LATE_SHARDS).alias("shard")
    seq = F.row_number().over(
        W.partitionBy("event_type", "shard").orderBy("ts", "event_id")
    )
    staged = (
        ev.select("event_type", "ts", "event_id", shard)
        .withColumn("seq", seq)
        .withColumn("secs", secs)
        .withColumn(
            "chunk", ((F.col("seq") - 1) / _LATE_CHUNK).cast("long")
        )
    )
    # Within-chunk running max: parallel across (type, chunk) — the
    # largest sort is one chunk, never one event type.
    w_in = (
        W.partitionBy("event_type", "chunk")
        .orderBy("seq", "shard")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    within = staged.withColumn("run_in", F.max("secs").over(w_in))
    # Prefix-carry over the tiny per-type chunk frame (one row per
    # chunk): max event time of all STRICTLY earlier chunks.
    w_carry = (
        W.partitionBy("event_type")
        .orderBy("chunk")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = (
        staged.groupBy("event_type", "chunk")
        .agg(F.max("secs").alias("cmax"))
        .select(
            "event_type", "chunk", F.max("cmax").over(w_carry).alias("carry")
        )
    )
    run = F.greatest(
        F.col("run_in"), F.coalesce(F.col("carry"), F.col("run_in"))
    )
    per = within.join(F.broadcast(carry), ["event_type", "chunk"]).select(
        "event_type", (run - F.col("secs")).alias("late_s")
    )
    return (
        per.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("late_s") > 0).cast("long")).alias("n_late"),
            F.max("late_s").alias("max_late_s"),
            F.sum("late_s").cast("long").alias("sum_late_s"),
        )
        .select(
            "event_type",
            "n_events",
            "n_late",
            (F.col("n_late") / F.col("n_events")).alias("late_share"),
            "max_late_s",
            (F.col("sum_late_s") / F.col("n_events")).alias("mean_late_s"),
        )
        .orderBy("event_type")
    )


WATERMARK_LATENESS_AUDIT_SQL = f"""
WITH staged AS (
  SELECT event_type, ts,
         user_id % {_LATE_SHARDS} AS shard,
         ROW_NUMBER() OVER (PARTITION BY event_type, user_id % {_LATE_SHARDS}
                            ORDER BY ts, event_id) AS seq
  FROM events
),
per AS (
  SELECT event_type,
         MAX(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY event_type ORDER BY seq, shard
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - CAST(floor(epoch(ts)) AS BIGINT) AS late_s
  FROM staged
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS late_share,
       MAX(late_s) AS max_late_s,
       CAST(SUM(late_s) AS DOUBLE) / COUNT(*) AS mean_late_s
FROM per
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Semi-structured (JSON) extraction — events.props is a JSON blob
# --------------------------------------------------------------------------

def q_json_event_props(spark, sf_dir):
    """Typed JSON extraction (from_json, JVM-side — no Python) then
    aggregation. At scale prefer extracting once into a materialized
    typed column over re-parsing per query."""
    ev = table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


JSON_EVENT_PROPS_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Data-quality layer: one-scan profiling + declarative rule gate
# --------------------------------------------------------------------------

def q_lineitem_profile(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators.quality import profile_columns

    li = table(spark, sf_dir, "lineitem")
    return profile_columns(
        li,
        ["l_returnflag", "l_quantity", "l_discount"],
        exact_distinct=True,  # oracle mode; scale default is HLL
    )


LINEITEM_PROFILE_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(*) FILTER (l_returnflag IS NULL) AS nulls_l_returnflag,
       COUNT(DISTINCT l_returnflag) AS distinct_l_returnflag,
       CAST(MIN(l_returnflag) AS VARCHAR) AS min_l_returnflag,
       CAST(MAX(l_returnflag) AS VARCHAR) AS max_l_returnflag,
       COUNT(*) FILTER (l_quantity IS NULL) AS nulls_l_quantity,
       COUNT(DISTINCT l_quantity) AS distinct_l_quantity,
       CAST(MIN(l_quantity) AS VARCHAR) AS min_l_quantity,
       CAST(MAX(l_quantity) AS VARCHAR) AS max_l_quantity,
       COUNT(*) FILTER (l_discount IS NULL) AS nulls_l_discount,
       COUNT(DISTINCT l_discount) AS distinct_l_discount,
       CAST(MIN(l_discount) AS VARCHAR) AS min_l_discount,
       CAST(MAX(l_discount) AS VARCHAR) AS max_l_discount
FROM lineitem
"""


def q_lineitem_dq_checks(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators.quality import check_rules

    li = table(spark, sf_dir, "lineitem")
    return check_rules(
        li,
        {
            "quantity_positive": F.col("l_quantity") > 0,
            "discount_in_range": (F.col("l_discount") >= 0)
            & (F.col("l_discount") <= 1),
            "price_positive": F.col("l_extendedprice") > 0,
            "shipdate_present": F.col("l_shipdate").isNotNull(),
        },
    ).orderBy("rule")


LINEITEM_DQ_CHECKS_SQL = f"""
WITH wide AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(*) FILTER (NOT COALESCE(l_quantity > 0, FALSE))
           AS v_quantity_positive,
         COUNT(*) FILTER (NOT COALESCE(l_discount >= 0 AND l_discount <= 1,
                                       FALSE)) AS v_discount_in_range,
         COUNT(*) FILTER (NOT COALESCE(l_extendedprice > 0, FALSE))
           AS v_price_positive,
         COUNT(*) FILTER (l_shipdate IS NULL) AS v_shipdate_present
  FROM lineitem
),
rules(rule, n_violations, n_rows) AS (
  SELECT 'quantity_positive', v_quantity_positive, n_rows FROM wide
  UNION ALL SELECT 'discount_in_range', v_discount_in_range, n_rows FROM wide
  UNION ALL SELECT 'price_positive', v_price_positive, n_rows FROM wide
  UNION ALL SELECT 'shipdate_present', v_shipdate_present, n_rows FROM wide
)
SELECT rule, n_violations, n_rows,
       {_sql_round('(n_rows - n_violations) / CAST(n_rows AS DOUBLE)', 6)}
         AS pass_rate
FROM rules
ORDER BY rule
"""


def q_lineitem_quarantine(spark, sf_dir):
    """Row-level quarantine routing (operators/quality.py::quarantine):
    deterministic dirt is injected in-plan (clean testdata — same
    device as unicode_sanitize), rows are tagged with their violated
    rules, and the quarantined side is summarized per reason
    combination with an id range for triage. Reasons stay in rule-
    declaration order via concat_ws over CASE tags — both engines
    compute the identical string, no array canonicalization in play."""
    from city_payroll_data_pipeline_spark.operators.quality import quarantine

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 37 == 0, -F.col("l_quantity"))
        .otherwise(F.col("l_quantity"))
        .alias("l_quantity"),
        F.when(F.col("l_orderkey") % 41 == 0, F.lit(1.5))
        .otherwise(F.col("l_discount"))
        .alias("l_discount"),
        F.when(F.col("l_orderkey") % 43 == 0, F.lit(None))
        .otherwise(F.col("l_shipdate"))
        .alias("l_shipdate"),
    )
    tagged = quarantine(
        li,
        {
            "quantity_positive": F.col("l_quantity") > 0,
            "discount_in_range": (F.col("l_discount") >= 0)
            & (F.col("l_discount") <= 1),
            "shipdate_present": F.col("l_shipdate").isNotNull(),
        },
    )
    return (
        tagged.filter(F.col("is_quarantined"))
        .groupBy(
            F.array_join("quarantine_reasons", ",").alias("reasons")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_orderkey").alias("first_key"),
            F.max("l_orderkey").alias("last_key"),
        )
        .orderBy("reasons")
    )


LINEITEM_QUARANTINE_SQL = """
WITH dirty AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 37 = 0 THEN -l_quantity
              ELSE l_quantity END AS l_quantity,
         CASE WHEN l_orderkey % 41 = 0 THEN 1.5
              ELSE l_discount END AS l_discount,
         CASE WHEN l_orderkey % 43 = 0 THEN NULL
              ELSE l_shipdate END AS l_shipdate
  FROM lineitem
),
tagged AS (
  SELECT l_orderkey,
         concat_ws(',',
           CASE WHEN NOT COALESCE(l_quantity > 0, FALSE)
                THEN 'quantity_positive' END,
           CASE WHEN NOT COALESCE(l_discount >= 0 AND l_discount <= 1,
                                  FALSE)
                THEN 'discount_in_range' END,
           CASE WHEN l_shipdate IS NULL THEN 'shipdate_present' END
         ) AS reasons
  FROM dirty
)
SELECT reasons, COUNT(*) AS n_rows,
       MIN(l_orderkey) AS first_key, MAX(l_orderkey) AS last_key
FROM tagged
WHERE reasons <> ''
GROUP BY reasons
ORDER BY reasons
"""


# --------------------------------------------------------------------------
# TPC-H Q6 shape — the maximally-selective single-table agg. Every
# predicate must reach the parquet scan (PushedFilters); the agg is a
# single partial/final pair over the surviving rows.
# --------------------------------------------------------------------------

def q_revenue_forecast(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * F.col("l_discount"),
                "revenue_effect",
                scale=6,
            ),
            F.count("*").alias("n_lines"),
        )
    )


REVENUE_FORECAST_SQL = f"""
SELECT {_sql_dec_sum('l_extendedprice * l_discount', 'revenue_effect', 6)},
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

# --------------------------------------------------------------------------
# holt_linear_forecast — Holt's double exponential smoothing (level +
# trend) over the monthly revenue series, h = 1..3 months ahead. The
# capacity-planning op of the time-series family: ewma_user_value is
# the level-only single smoother; this adds the trend recursion
# (α = 3/10, β = 2/10 as exact rationals):
#
#   l_t = (3·y_t + 7·(l_{t-1} + b_{t-1})) div 10
#   b_t = (2·(l_t − l_{t-1}) + 8·b_{t-1}) div 10      (l_1 = y_1, b_1 = 0)
#   ŷ_{T+h} = l_T + h·b_T
#
# Everything is integer micro-dollars (the exact DECIMAL(18,6) month
# sum × 10^6), and Spark `div` / DuckDB `//` both truncate toward
# zero INCLUDING negatives (verified), so a declining-trend b < 0 is
# replayed bit-exactly. The recursion itself is ONE codegen'd
# `aggregate` fold over the sorted month array (DuckDB: list_reduce
# seeded by the first element — the same l_1 = y_1, b_1 = 0 init).
#
# Scale: the corpus-sized work is the one month groupBy (map-side
# combinable); the fold runs over a months-long array (~10^2 entries
# for decades of data) — model-sized, like the BPE merge replay.
# Overflow bound: 3y+7(l+b) < 10·max-month-micros, safe to ~10^17
# micro-dollars/month; switch the scale constant to cents beyond.
# --------------------------------------------------------------------------

_HOLT_FOLD = """
aggregate(
  slice(transform(ser, s -> named_struct('l', s.y, 'b', CAST(0 AS BIGINT))),
        2, size(ser) - 1),
  named_struct('l', element_at(ser, 1).y, 'b', CAST(0 AS BIGINT)),
  (acc, x) -> named_struct(
    'l', (3 * x.l + 7 * (acc.l + acc.b)) div 10,
    'b', (2 * (((3 * x.l + 7 * (acc.l + acc.b)) div 10) - acc.l)
          + 8 * acc.b) div 10))
"""


def q_holt_linear_forecast(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("m")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
            " AS DECIMAL(18,6))) * 1000000 AS BIGINT)"
        ).alias("y")
    )
    packed = monthly.agg(
        F.array_sort(F.collect_list(F.struct("m", "y"))).alias("ser"),
        F.count("*").alias("n_months"),
    )
    st = packed.select(
        "n_months", F.expr(_HOLT_FOLD).alias("st")
    ).select(
        "n_months",
        F.col("st.l").alias("level_micro"),
        F.col("st.b").alias("trend_micro"),
        *[
            (F.col("st.l") + h * F.col("st.b")).alias(f"fc{h}_micro")
            for h in (1, 2, 3)
        ],
    )
    out = st.select(
        "n_months",
        "level_micro",
        "trend_micro",
        "fc1_micro",
        "fc2_micro",
        "fc3_micro",
        (F.col("level_micro") / F.lit(1000000.0)).alias("level"),
        (F.col("trend_micro") / F.lit(1000000.0)).alias("trend"),
        (F.col("fc1_micro") / F.lit(1000000.0)).alias("forecast_1"),
        (F.col("fc2_micro") / F.lit(1000000.0)).alias("forecast_2"),
        (F.col("fc3_micro") / F.lit(1000000.0)).alias("forecast_3"),
    )
    return out


# The oracle replays the fold as a RECURSIVE CTE over the month
# index (the max_coverage_select precedent), NOT list_reduce: DuckDB
# 1.0's list_reduce updates the accumulator struct FIELD BY FIELD, so
# a later field's expression reading acc.<earlier-field> silently
# sees the already-updated value — measured here as a wrong trend on
# the first step. The step join makes each iteration read only the
# previous row, which has classic fold semantics by construction.
HOLT_LINEAR_FORECAST_SQL = """
WITH RECURSIVE monthly AS (
  SELECT date_trunc('month', l_shipdate) AS m,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
idx AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY m) AS i FROM monthly
),
n AS (SELECT COUNT(*) AS c FROM idx),
rec AS (
  SELECT CAST(1 AS BIGINT) AS i,
         (SELECT y FROM idx WHERE i = 1) AS l,
         CAST(0 AS BIGINT) AS b
  UNION ALL
  SELECT r.i + 1,
         (3 * x.y + 7 * (r.l + r.b)) // 10,
         (2 * (((3 * x.y + 7 * (r.l + r.b)) // 10) - r.l) + 8 * r.b) // 10
  FROM rec r JOIN idx x ON x.i = r.i + 1
)
SELECT (SELECT c FROM n) AS n_months,
       l AS level_micro,
       b AS trend_micro,
       l + 1 * b AS fc1_micro,
       l + 2 * b AS fc2_micro,
       l + 3 * b AS fc3_micro,
       CAST(l AS DOUBLE) / 1000000.0 AS level,
       CAST(b AS DOUBLE) / 1000000.0 AS trend,
       CAST(l + 1 * b AS DOUBLE) / 1000000.0 AS forecast_1,
       CAST(l + 2 * b AS DOUBLE) / 1000000.0 AS forecast_2,
       CAST(l + 3 * b AS DOUBLE) / 1000000.0 AS forecast_3
FROM rec WHERE i = (SELECT c FROM n)
"""

# --------------------------------------------------------------------------
# holt_winters_seasonal — additive Holt-Winters (level + trend +
# 12-month seasonal) over the monthly revenue series, completing the
# forecasting ladder: ewma_user_value (level) → holt_linear_forecast
# (level+trend) → this (level+trend+season). A capacity planner that
# ignores seasonality over-orders in the trough and starves the peak;
# the seasonal state is exactly what the two simpler smoothers cannot
# represent.
#
# Recursion (α = 3/10, β = 2/10, γ = 1/10 as exact rationals; m = 12):
#
#   l_t = (3·(y_t − s_{t−m}) + 7·(l_{t−1} + b_{t−1})) div 10
#   b_t = (2·(l_t − l_{t−1}) + 8·b_{t−1}) div 10
#   s_t = (1·(y_t − l_t) + 9·s_{t−m}) div 10
#   ŷ_{T+h} = l_T + h·b_T + s_{T+h−m}            (h = 1..3 ≤ m)
#
# Init is the two-season moment estimate, documented so the replay is
# unambiguous: L = mean(y_{m+1..2m}), B = (Σ₂ − Σ₁) div m², s_i =
# y_{m+i} − L for i = 1..m (second season vs its own mean), recursion
# over t = 2m+1..T — no observation feeds both init and recursion.
# Requires T ≥ 2m + 1 (the testdata series spans 83 months at every
# SF). The rolling seasonal state rides IN the fold accumulator as an
# m-element BIGINT array whose head is always s_{t−m}: each step
# consumes the head and appends s_t (concat(slice(s,2,m−1),[s_t])),
# so no step indexes by absolute time.
#
# Exactness: integer micro-dollars throughout; Spark `div` and DuckDB
# `//` both truncate toward zero including negatives (the Holt
# verification covers y−s < 0 and b < 0); the oracle replays the fold
# as a RECURSIVE CTE carrying the seasonal LIST in the recursion (the
# list head/rotate ops are bit-exact on both engines) — NOT
# list_reduce, per the Holt field-by-field-accumulator finding.
#
# Scale: identical envelope to holt_linear_forecast — the corpus-sized
# work is ONE map-side-combinable month groupBy; the fold runs over a
# months-long array (model-sized). Overflow: terms peak near
# 10·max-month-micros — safe to ~10^17 micro-dollars/month, switch the
# scale constant to cents beyond (same bound as Holt).
# --------------------------------------------------------------------------

_HW_M = 12  # season length (months)

_HW_FOLD = f"""
aggregate(
  slice(ser, {2 * _HW_M + 1}, size(ser) - {2 * _HW_M}),
  named_struct('l', l0, 'b', b0, 's', s0),
  (acc, x) -> named_struct(
    'l', (3 * (x.y - element_at(acc.s, 1)) + 7 * (acc.l + acc.b)) div 10,
    'b', (2 * (((3 * (x.y - element_at(acc.s, 1)) + 7 * (acc.l + acc.b))
                div 10) - acc.l) + 8 * acc.b) div 10,
    's', concat(slice(acc.s, 2, {_HW_M - 1}), array(
           (1 * (x.y - ((3 * (x.y - element_at(acc.s, 1))
                         + 7 * (acc.l + acc.b)) div 10))
            + 9 * element_at(acc.s, 1)) div 10))))
"""


def _hw_state(packed):
    """(ser, n_months) → (n_months, st) — the two-season moment init
    plus the rotating-seasonal fold, factored out so the property test
    replays the EXACT production expressions (not a paraphrase)."""
    m = _HW_M
    pre = packed.select(
        "n_months",
        "ser",
        F.expr(
            f"aggregate(slice(ser, {m + 1}, {m}), CAST(0 AS BIGINT),"
            f" (a, x) -> a + x.y) div {m}"
        ).alias("l0"),
        F.expr(
            f"(aggregate(slice(ser, {m + 1}, {m}), CAST(0 AS BIGINT),"
            f" (a, x) -> a + x.y)"
            f" - aggregate(slice(ser, 1, {m}), CAST(0 AS BIGINT),"
            f" (a, x) -> a + x.y)) div {m * m}"
        ).alias("b0"),
    ).withColumn(
        "s0", F.expr(f"transform(slice(ser, {m + 1}, {m}), v -> v.y - l0)")
    )
    return pre.select("n_months", F.expr(_HW_FOLD).alias("st"))


def q_holt_winters_seasonal(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("m")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
            " AS DECIMAL(18,6))) * 1000000 AS BIGINT)"
        ).alias("y")
    )
    packed = monthly.agg(
        F.array_sort(F.collect_list(F.struct("m", "y"))).alias("ser"),
        F.count("*").alias("n_months"),
    )
    st = _hw_state(packed).select(
        "n_months",
        F.col("st.l").alias("level_micro"),
        F.col("st.b").alias("trend_micro"),
        (
            F.array_max("st.s") - F.array_min("st.s")
        ).alias("seasonal_range_micro"),
        *[
            (
                F.col("st.l")
                + h * F.col("st.b")
                + F.element_at(F.col("st.s"), h)
            ).alias(f"fc{h}_micro")
            for h in (1, 2, 3)
        ],
    )
    return st.select(
        "n_months",
        "level_micro",
        "trend_micro",
        "seasonal_range_micro",
        "fc1_micro",
        "fc2_micro",
        "fc3_micro",
        (F.col("level_micro") / F.lit(1000000.0)).alias("level"),
        (F.col("trend_micro") / F.lit(1000000.0)).alias("trend"),
        (F.col("fc1_micro") / F.lit(1000000.0)).alias("forecast_1"),
        (F.col("fc2_micro") / F.lit(1000000.0)).alias("forecast_2"),
        (F.col("fc3_micro") / F.lit(1000000.0)).alias("forecast_3"),
    )


HOLT_WINTERS_SEASONAL_SQL = f"""
WITH RECURSIVE monthly AS (
  SELECT date_trunc('month', l_shipdate) AS m,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
idx AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY m) AS i FROM monthly
),
n AS (SELECT COUNT(*) AS c FROM idx),
sums AS (
  SELECT
    CAST((SELECT SUM(y) FROM idx WHERE i BETWEEN 1 AND {_HW_M})
         AS BIGINT) AS sum1,
    CAST((SELECT SUM(y) FROM idx
          WHERE i BETWEEN {_HW_M + 1} AND {2 * _HW_M}) AS BIGINT) AS sum2
),
init AS (
  SELECT sum2 // {_HW_M} AS l0,
         (sum2 - sum1) // {_HW_M * _HW_M} AS b0,
         (SELECT list(y - (SELECT sum2 // {_HW_M} FROM sums) ORDER BY i)
          FROM idx WHERE i BETWEEN {_HW_M + 1} AND {2 * _HW_M}) AS s0
  FROM sums
),
rec AS (
  SELECT CAST({2 * _HW_M} AS BIGINT) AS i, l0 AS l, b0 AS b, s0 AS s
  FROM init
  UNION ALL
  SELECT r.i + 1,
         (3 * (x.y - r.s[1]) + 7 * (r.l + r.b)) // 10,
         (2 * (((3 * (x.y - r.s[1]) + 7 * (r.l + r.b)) // 10) - r.l)
          + 8 * r.b) // 10,
         list_concat(r.s[2:{_HW_M}],
                     [(1 * (x.y - ((3 * (x.y - r.s[1])
                                    + 7 * (r.l + r.b)) // 10))
                       + 9 * r.s[1]) // 10])
  FROM rec r JOIN idx x ON x.i = r.i + 1
)
SELECT (SELECT c FROM n) AS n_months,
       l AS level_micro,
       b AS trend_micro,
       list_max(s) - list_min(s) AS seasonal_range_micro,
       l + 1 * b + s[1] AS fc1_micro,
       l + 2 * b + s[2] AS fc2_micro,
       l + 3 * b + s[3] AS fc3_micro,
       CAST(l AS DOUBLE) / 1000000.0 AS level,
       CAST(b AS DOUBLE) / 1000000.0 AS trend,
       CAST(l + 1 * b + s[1] AS DOUBLE) / 1000000.0 AS forecast_1,
       CAST(l + 2 * b + s[2] AS DOUBLE) / 1000000.0 AS forecast_2,
       CAST(l + 3 * b + s[3] AS DOUBLE) / 1000000.0 AS forecast_3
FROM rec WHERE i = (SELECT c FROM n)
"""

# --------------------------------------------------------------------------
# TPC-H Q4 shape — priority checking: orders with at least one
# qualifying line (EXISTS → left-semi; the lineitem side never
# multiplies order rows), counted per priority.
# --------------------------------------------------------------------------

def q_priority_order_check(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    flagged = li.filter(F.col("l_discount") >= 0.08).select("l_orderkey")
    return (
        orders.join(flagged, orders.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


PRIORITY_ORDER_CHECK_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount >= 0.08)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# --------------------------------------------------------------------------
# Distribution ranks — percent_rank / cume_dist within order priority
# (where does an order sit in its class's price distribution). One
# shuffle on the partition key; ties resolved by the orderkey so the
# rank columns are engine-exact.
# --------------------------------------------------------------------------

def q_order_price_distribution(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        )
        .filter(F.col("o_orderkey") % 20 == 0)  # thin the output only
    )


ORDER_PRICE_DISTRIBUTION_SQL = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         percent_rank() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS pr,
         cume_dist() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS cd
  FROM orders
)
SELECT o_orderpriority, o_orderkey, o_totalprice,
       {_sql_round('pr', 6)} AS pct_rank,
       {_sql_round('cd', 6)} AS cume_dist
FROM ranked
WHERE o_orderkey % 20 = 0
"""

# --------------------------------------------------------------------------
# Sequential conversion funnel — signup → view → click → purchase,
# each step strictly after the previous step and within a 24 h
# conversion window of it (greedy first-occurrence matching, the
# semantics funnel tools use).
#
# Spark-first design: ONE shuffle. Events collapse to a per-user
# time-sorted array (collect_list + array_sort — partial aggregation
# applies), then a codegen'd ``aggregate`` fold walks each user's
# history once carrying the four step timestamps as state. The
# alternative (chained conditional-min aggregations with a join per
# step) shuffles the full event stream on user_id once per step — 4×
# the exchanges at 100 TB. The DuckDB oracle uses that chained-CTE
# formulation precisely BECAUSE it's a different algorithm computing
# the same answer.
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def q_event_funnel(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
    )
    ts_null = F.lit(None).cast("timestamp")
    init = F.struct(
        *[ts_null.alias(f"t{i}") for i in range(len(_FUNNEL_STEPS))]
    )

    def step(acc, e, i, name):
        if i == 0:
            in_window = F.lit(True)
        else:
            prev = acc[f"t{i-1}"]
            in_window = (
                prev.isNotNull()
                & (e["ts"] > prev)
                & (e["ts"] <= prev + F.expr("INTERVAL 24 HOURS"))
            )
        hit = (
            (e["event_type"] == name) & in_window & acc[f"t{i}"].isNull()
        )
        return F.coalesce(acc[f"t{i}"], F.when(hit, e["ts"])).alias(f"t{i}")

    folded = seq.select(
        "user_id",
        F.aggregate(
            "evs",
            init,
            lambda acc, e: F.struct(
                *[
                    step(acc, e, i, n)
                    for i, n in enumerate(_FUNNEL_STEPS)
                ]
            ),
        ).alias("st"),
    )
    counts = folded.agg(
        *[
            F.count(F.col(f"st.t{i}")).alias(f"c{i}")
            for i in range(len(_FUNNEL_STEPS))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(n).alias("step_name"),
                F.col(f"c{i}").alias("n_users"),
                (
                    F.lit(1.0)
                    if i == 0
                    else F.when(
                        F.col(f"c{i-1}") > 0,
                        F.col(f"c{i}").cast("double") / F.col(f"c{i-1}"),
                    )
                ).alias("conv_from_prev"),
            )
            for i, n in enumerate(_FUNNEL_STEPS)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("r"))
        .select("r.step", "r.step_name", "r.n_users",
                F.round(F.col("r.conv_from_prev"), 6).alias("conv_from_prev"))
        .orderBy("step")
    )


EVENT_FUNNEL_SQL = f"""
WITH t0 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
t1 AS (
  SELECT e.user_id, min(ts) AS t FROM events e JOIN t0 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > t0.t
    AND e.ts <= t0.t + INTERVAL 24 HOUR GROUP BY 1
),
t2 AS (
  SELECT e.user_id, min(ts) AS t FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > t1.t
    AND e.ts <= t1.t + INTERVAL 24 HOUR GROUP BY 1
),
t3 AS (
  SELECT e.user_id, min(ts) AS t FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > t2.t
    AND e.ts <= t2.t + INTERVAL 24 HOUR GROUP BY 1
),
c AS (
  SELECT (SELECT count(*) FROM t0) AS c0, (SELECT count(*) FROM t1) AS c1,
         (SELECT count(*) FROM t2) AS c2, (SELECT count(*) FROM t3) AS c3
)
SELECT 1 AS step, 'signup' AS step_name, c0 AS n_users,
       CAST(ROUND(CAST(CAST((1.0) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS conv_from_prev FROM c
UNION ALL
SELECT 2, 'view', c1,
       CAST(ROUND(CAST(CAST((CASE WHEN c0 > 0 THEN CAST(c1 AS DOUBLE) / c0 END) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) FROM c
UNION ALL
SELECT 3, 'click', c2,
       CAST(ROUND(CAST(CAST((CASE WHEN c1 > 0 THEN CAST(c2 AS DOUBLE) / c1 END) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) FROM c
UNION ALL
SELECT 4, 'purchase', c3,
       CAST(ROUND(CAST(CAST((CASE WHEN c2 > 0 THEN CAST(c3 AS DOUBLE) / c2 END) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) FROM c
ORDER BY step
"""

# --------------------------------------------------------------------------
# Error-spike detection — hourly error rate vs the trailing 6-hour
# rate (ROWS frame on integer sums; the only floats are two divisions
# over identical integers, so the spike flag is engine-exact). The ops
# query every pipeline needs over its own event log. The global-order
# window runs on the ALREADY-AGGREGATED hourly series (720 rows per
# month however big the raw log is) — a single-partition window over
# an aggregate this small is the right plan at any scale.
# --------------------------------------------------------------------------

def q_error_spikes(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.count_if(F.col("event_type") == "error").alias("n_errors"),
        )
    )
    w = W.orderBy("hour").rowsBetween(-6, -1)
    trailing = hourly.select(
        "hour",
        "n_events",
        "n_errors",
        F.sum("n_events").over(w).alias("t_events"),
        F.sum("n_errors").over(w).alias("t_errors"),
    )
    rate = F.col("n_errors").cast("double") / F.col("n_events")
    t_rate = F.col("t_errors").cast("double") / F.col("t_events")
    return (
        trailing.filter(F.col("t_events").isNotNull())
        .select(
            "hour",
            "n_events",
            "n_errors",
            F.round(rate, 6).alias("err_rate"),
            F.round(t_rate, 6).alias("trailing_rate"),
            (rate > 1.5 * t_rate).alias("is_spike"),
        )
        .orderBy("hour")
    )


ERROR_SPIKES_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         count(*) AS n_events,
         count(*) FILTER (WHERE event_type = 'error') AS n_errors
  FROM events GROUP BY 1
),
trail AS (
  SELECT hour, n_events, n_errors,
         sum(n_events) OVER (ORDER BY hour
                             ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
           AS t_events,
         sum(n_errors) OVER (ORDER BY hour
                             ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
           AS t_errors
  FROM hourly
)
SELECT hour, n_events, n_errors,
       {_sql_round('CAST(n_errors AS DOUBLE) / n_events', 6)} AS err_rate,
       {_sql_round('CAST(t_errors AS DOUBLE) / t_events', 6)} AS trailing_rate,
       CAST(n_errors AS DOUBLE) / n_events
         > 1.5 * (CAST(t_errors AS DOUBLE) / t_events) AS is_spike
FROM trail
WHERE t_events IS NOT NULL
ORDER BY hour
"""

# --------------------------------------------------------------------------
# Weekly cohort retention — users grouped by first-active week,
# retention = share of the cohort active in week N. Three exchanges,
# all on keys that shrink the data: user-level first-week agg,
# user-week distinct, then (cohort, offset) counts; the first two are
# co-partitioned on user_id so AQE reuses the exchange.
# --------------------------------------------------------------------------

def q_cohort_retention(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    user_weeks = ev.select("user_id", wk.alias("week")).distinct()
    cohorts = user_weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        user_weeks.join(cohorts, "user_id")
        .select(
            "cohort_week",
            ((F.datediff("week", "cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_SQL = """
WITH user_weeks AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events
),
cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM user_weeks GROUP BY 1
),
sizes AS (
  SELECT cohort_week, count(*) AS cohort_size FROM cohorts GROUP BY 1
),
active AS (
  SELECT c.cohort_week,
         CAST(datediff('day', c.cohort_week, w.week) / 7 AS INT)
           AS week_offset,
         count(*) AS n_active
  FROM user_weeks w JOIN cohorts c USING (user_id)
  GROUP BY 1, 2
)
SELECT a.cohort_week, a.week_offset, a.n_active,
       CAST(ROUND(CAST(CAST((CAST(a.n_active AS DOUBLE) / s.cohort_size) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS retention
FROM active a JOIN sizes s USING (cohort_week)
ORDER BY cohort_week, week_offset
"""

# --------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution. LEFT OUTER join
# (the outer join keeps never-ordered customers at count 0) + two
# aggregations, the second over a frame of at most max(order-count)
# rows. At 100 TB the outer join shuffles both sides on custkey; the
# histogram agg is a near-free single-digit-row reduction.
# --------------------------------------------------------------------------

def q_customer_order_distribution(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer
  LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""

# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders. The HAVING-filtered per-order
# quantity agg shrinks lineitem to a handful of orderkeys — broadcast
# THAT into orders, and the orders⋈customer probe stays tiny too. The
# only full shuffle is lineitem's map-side-combined groupBy; neither
# fact table shuffles for the joins.
# --------------------------------------------------------------------------

_BIG_QTY = 300


def q_large_volume_customers(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > _BIG_QTY)
    )
    hits = orders.join(
        F.broadcast(big), orders.o_orderkey == big.l_orderkey
    )
    return (
        customer.join(F.broadcast(hits), hits.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


LARGE_VOLUME_CUSTOMERS_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN (
  SELECT l_orderkey,
         {_sql_dec_sum('l_quantity', 'total_qty')}
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > {_BIG_QTY}
) big ON o_orderkey = big.l_orderkey
ORDER BY o_totalprice DESC, o_orderkey
"""

# --------------------------------------------------------------------------
# TPC-H Q2 shape: cheapest supplier per part. The classic correlated
# MIN subquery re-expressed Spark-first as an argmin window (single
# shuffle on l_partkey; no self-join, no subquery re-scan of the fact).
# Deterministic tie-break: (unit price, suppkey) ascending.
# --------------------------------------------------------------------------

def q_cheapest_supplier_per_part(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    supplier = table(spark, sf_dir, "supplier")
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    w = W.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = (
        unit.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        # part/supplier scale with SF — no broadcast hints; the planner
        # broadcasts them at test scale and shuffle-joins at 100 TB
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supplier, best.l_suppkey == supplier.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            F.col("l_suppkey").alias("best_suppkey"),
            "s_name",
            F.round("unit_price", 4).alias("unit_price"),
        )
        .orderBy("p_partkey")
    )


CHEAPEST_SUPPLIER_PER_PART_SQL = f"""
WITH best AS (
  SELECT l_partkey, l_suppkey, unit_price
  FROM (
    SELECT l_partkey, l_suppkey,
           l_extendedprice / l_quantity AS unit_price,
           ROW_NUMBER() OVER (PARTITION BY l_partkey
                              ORDER BY l_extendedprice / l_quantity,
                                       l_suppkey) AS rn
    FROM lineitem
  ) WHERE rn = 1
)
SELECT p_partkey, p_brand, l_suppkey AS best_suppkey, s_name,
       {_sql_round('unit_price', 4)} AS unit_price
FROM best
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size >= 40
ORDER BY p_partkey
"""

# --------------------------------------------------------------------------
# TPC-H Q16 shape: distinct supplier count per (brand, type-prefix,
# size-band), suppliers observed via lineitem pairs (the testdata has
# no partsupp). COUNT(DISTINCT) forces an expand+two-phase agg; part
# scales with SF so it carries no broadcast hint — the size-based
# planner broadcasts it at test scale, leaving the grouping keys as
# the only shuffle, and falls back to a partkey shuffle join at 100 TB.
# --------------------------------------------------------------------------

def q_parts_supplier_counts(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            F.substring("p_type", 1, 5).alias("type_prefix"),
            (F.col("p_size") - F.col("p_size") % 10).alias("size_band"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "type_prefix", "size_band")
    )


PARTS_SUPPLIER_COUNTS_SQL = """
SELECT p_brand,
       substring(p_type, 1, 5) AS type_prefix,
       p_size - p_size % 10 AS size_band,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, type_prefix, size_band
"""

# --------------------------------------------------------------------------
# Join-key skew profile — the diagnostic that justifies (or rules out)
# salting before shuffling 100 TB on a key. Map-side-combined counts,
# top-n without a global sort, 1-row stats broadcast.
# --------------------------------------------------------------------------

def q_join_key_skew(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators.skew import (
        key_skew_profile,
    )

    ev = table(spark, sf_dir, "events")
    return key_skew_profile(ev, "user_id", top_n=10)


JOIN_KEY_SKEW_SQL = f"""
WITH counts AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
),
stats AS (
  SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows FROM counts
),
top AS (
  SELECT user_id, cnt FROM counts ORDER BY cnt DESC, user_id LIMIT 10
)
SELECT user_id, cnt, n_keys, n_rows,
       {_sql_round('CAST(cnt AS DOUBLE) / n_rows', 6)} AS row_share,
       {_sql_round('CAST(cnt * n_keys AS DOUBLE) / n_rows', 6)} AS skew_factor
FROM top, stats
"""

# --------------------------------------------------------------------------
# Winsorized robust stats — outlier-capped money aggregates. Caps are
# per-group exact percentiles (the cap table is group-cardinality-sized
# → broadcast back); at 100 TB swap F.percentile for approx_percentile
# and keep the identical clamp/agg shape.
# --------------------------------------------------------------------------

def q_winsorized_price_stats(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    caps = orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.05), 6).alias("lo"),
        F.round(F.percentile("o_totalprice", 0.95), 6).alias("hi"),
    )
    capped = orders.join(F.broadcast(caps), "o_orderpriority")
    return (
        capped.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "raw_sum"),
            _dec_sum(
                F.least(
                    F.greatest(F.col("o_totalprice"), F.col("lo")),
                    F.col("hi"),
                ),
                "winsorized_sum",
                scale=6,
            ),
            F.count(
                F.when(
                    (F.col("o_totalprice") < F.col("lo"))
                    | (F.col("o_totalprice") > F.col("hi")),
                    1,
                )
            ).alias("n_capped"),
        )
        .orderBy("o_orderpriority")
    )


WINSORIZED_PRICE_STATS_SQL = f"""
WITH caps AS (
  SELECT o_orderpriority,
         {_sql_round('quantile_cont(o_totalprice, 0.05)', 6)} AS lo,
         {_sql_round('quantile_cont(o_totalprice, 0.95)', 6)} AS hi
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {_sql_dec_sum('o_totalprice', 'raw_sum')},
       {_sql_dec_sum('least(greatest(o_totalprice, lo), hi)', 'winsorized_sum', 6)},
       COUNT(*) FILTER (WHERE o_totalprice < lo OR o_totalprice > hi)
         AS n_capped
FROM orders JOIN caps USING (o_orderpriority)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# --------------------------------------------------------------------------
# Rolling distinct actives (DAU / trailing-7-day WAU / stickiness).
# COUNT(DISTINCT) can't live inside a window frame, so the scalable
# shape is: dedupe to (day, user) pairs first (the only event-sized
# shuffle), then fan each pair out to the ≤7 window days via a
# broadcast day-spine non-equi join — fan-out is bounded by the window,
# never by the data.
# --------------------------------------------------------------------------

def q_rolling_active_users(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    days = pairs.select("day").distinct()
    dau = pairs.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    wau = (
        pairs.alias("p")
        .join(
            F.broadcast(days.alias("d")),
            (F.col("p.day") <= F.col("d.day"))
            & (F.col("p.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("p.user_id").alias("wau7"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau7",
            F.round(F.col("dau") / F.col("wau7"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


ROLLING_ACTIVE_USERS_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM pairs),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM pairs GROUP BY day),
wau AS (
  SELECT d.day, COUNT(DISTINCT p.user_id) AS wau7
  FROM pairs p JOIN days d
    ON p.day <= d.day AND p.day >= d.day - INTERVAL 6 DAY
  GROUP BY d.day
)
SELECT day, dau, wau7,
       {_sql_round('CAST(dau AS DOUBLE) / wau7', 6)} AS stickiness
FROM dau JOIN wau USING (day)
ORDER BY day
"""

# --------------------------------------------------------------------------
# TPC-H Q5 shape — local supplier volume: revenue for orders where the
# customer and the supplier share a nation, within one region and year.
# Scale shape: the region filter is pushed into the nation→supplier dim
# chain BEFORE touching the fact, so lineitem joins against an
# already-pruned broadcast side; the fact-sized shuffles are
# lineitem⋈orders on orderkey and the customer join on custkey.
# customer scales with SF (1.5M rows/TB), so it carries NO broadcast
# hint — AQE broadcasts it at test scale and shuffle-joins at 100 TB.
# The c_nationkey = s_nationkey constraint is a post-join filter on
# dim columns, never a join of two fact-sized sides.
# --------------------------------------------------------------------------

def q_local_supplier_volume(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    asia = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    supp_asia = supplier.join(
        F.broadcast(asia), supplier.s_nationkey == asia.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    ).select("o_orderkey", "o_custkey")
    joined = (
        li.join(ord_f, li.l_orderkey == ord_f.o_orderkey)
        .join(F.broadcast(supp_asia), li.l_suppkey == supp_asia.s_suppkey)
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            )
        )
        .orderBy(F.desc("revenue"), "nation")
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n_name AS nation,
       {_sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue', 6)}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, nation
"""


# --------------------------------------------------------------------------
# TPC-H Q7 shape — bilateral trade flows: revenue shipped between two
# specific nations (supplier side → customer side) per ship year.
# Scale shape: both nation filters prune their dim chains before the
# fact joins (asymmetric pair filter applied on broadcast columns), so
# lineitem rows from uninvolved suppliers are dropped at the first
# broadcast join.
# --------------------------------------------------------------------------

def q_nation_trade_flows(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = nation.select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(*pair))
    n2 = nation.select(
        F.col("n_nationkey").alias("cust_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(*pair))
    supp = supplier.join(
        F.broadcast(n1), supplier.s_nationkey == F.col("supp_nkey")
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(n2), customer.c_nationkey == F.col("cust_nkey")
    ).select("c_custkey", "cust_nation")
    joined = (
        # supp/cust are 2-of-25-nation slivers of SF-scaling tables —
        # no hints; AQE broadcasts at test scale, shuffles at 100 TB
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            )
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


NATION_TRADE_FLOWS_SQL = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
       {_sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue', 6)}
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


# --------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item reporting: top 20 customers by lost
# revenue on returned lines in one quarter. Scale shape: aggregate
# revenue per custkey FIRST (fact-sized shuffle reduced to
# one-row-per-customer), then join the small aggregate to the customer
# dim — the customer join never sees lineitem cardinality. Top-20 is
# TakeOrderedAndProject (no global sort materialization).
# --------------------------------------------------------------------------

def q_returned_items_top_customers(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-10-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        li.filter(F.col("l_returnflag") == "R")
        .join(ord_f, li.l_orderkey == ord_f.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            )
        )
    )
    return (
        per_cust.join(
            customer, per_cust.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "c_acctbal",
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


RETURNED_ITEMS_TOP_CUSTOMERS_SQL = f"""
SELECT c_custkey, c_name, revenue, c_acctbal, n_name AS nation
FROM (
  SELECT o_custkey,
         {_sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue', 6)}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-10-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY o_custkey
) r
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# TPC-H Q12 shape (adapted: testdata has no l_shipmode/commitdate) —
# shipping-latency SLA per order priority: lines shipped more than 90
# days after the order date count as late. One fact-fact shuffle join,
# conditional counts folded into a single aggregation pass.
# --------------------------------------------------------------------------

def q_late_shipment_priority(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.count_if(late).alias("n_late"),
            F.round(F.count_if(late) / F.count("*"), 6).alias("late_ratio"),
        )
        .orderBy("o_orderpriority")
    )


LATE_SHIPMENT_PRIORITY_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       COUNT(*) FILTER (WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY) AS n_late,
       {_sql_round("CAST(COUNT(*) FILTER (WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY) AS DOUBLE) / COUNT(*)", 6)} AS late_ratio
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q14 shape — promo revenue share for one ship month: conditional
# sum over a lineitem⋈part join. Scale shape: the shipdate filter
# prunes lineitem before the join; part is ~30× smaller than lineitem
# and joins on its key (AQE picks broadcast at small scale, shuffle
# hash at 100 TB where part itself is TB-sized).
# --------------------------------------------------------------------------

def q_promo_revenue_share(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01")))
    ).join(part.select("p_partkey", "p_type"), li.l_partkey == F.col("p_partkey"))
    return joined.agg(
        _dec_sum(
            F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)),
            "promo_revenue",
            scale=6,
        ),
        _dec_sum(rev, "total_revenue", scale=6),
    ).select(
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )


PROMO_REVENUE_SHARE_SQL = f"""
WITH agg AS (
  SELECT
    {_sql_dec_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 'promo_revenue', 6)},
    {_sql_dec_sum('l_extendedprice * (1 - l_discount)', 'total_revenue', 6)}
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
    AND l_shipdate < TIMESTAMP '1997-10-01'
)
SELECT promo_revenue, total_revenue,
       {_sql_round('100.0 * promo_revenue / total_revenue', 6)} AS promo_pct
FROM agg
"""


# --------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier: the supplier(s) hitting the maximum
# quarterly revenue. Scale shape: revenue is reduced per-suppkey first
# (one fact shuffle), the global max is a 1-row aggregate joined back
# by VALUE EQUALITY (BroadcastHashJoin on revenue — not a cross join),
# and the surviving handful of rows is broadcast into the supplier dim.
# --------------------------------------------------------------------------

def q_top_supplier_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    per_supp = (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-07-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01")))
        )
        .groupBy("l_suppkey")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            )
        )
    )
    max_rev = per_supp.agg(F.max("revenue").alias("revenue"))
    top = per_supp.join(F.broadcast(max_rev), "revenue")
    return (
        supplier.join(F.broadcast(top), supplier.s_suppkey == top.l_suppkey)
        .select("s_suppkey", "s_name", "revenue")
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_REVENUE_SQL = f"""
WITH per_supp AS (
  SELECT l_suppkey,
         {_sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue', 6)}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-07-01'
    AND l_shipdate < TIMESTAMP '1997-10-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue = (SELECT MAX(revenue) FROM per_supp)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# TPC-H Q17 shape — small-quantity-order revenue: lines whose quantity
# is below 20% of their part's average, restricted to one brand/type
# slice. Scale shape: the brand/type filter prunes part to a sliver
# that is BROADCAST into lineitem (the 100 TB side never shuffles for
# the probe); the per-part average is computed only over the surviving
# lines and broadcast back, so no fact-sized self-join materializes.
# The average routes through exact decimal sums so both engines compare
# against bit-identical thresholds.
# --------------------------------------------------------------------------

def q_small_quantity_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    pf = part.filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    lif = li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
    avgq = lif.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    ).select(F.col("l_partkey").alias("aq_partkey"), "avg_qty")
    return (
        lif.join(F.broadcast(avgq), lif.l_partkey == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(_dec_sum(F.col("l_extendedprice"), "total_price", scale=2))
        .select(
            F.round(F.col("total_price") / 7.0, 2).alias("avg_yearly")
        )
    )


SMALL_QUANTITY_REVENUE_SQL = f"""
WITH sel AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
),
avgs AS (
  SELECT l_partkey AS aq_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM sel GROUP BY l_partkey
),
tot AS (
  SELECT {_sql_dec_sum('l_extendedprice', 'total_price', 2)}
  FROM sel JOIN avgs ON l_partkey = aq_partkey
  WHERE l_quantity < 0.2 * avg_qty
)
SELECT {_sql_round('total_price / 7.0', 2)} AS avg_yearly FROM tot
"""


# --------------------------------------------------------------------------
# TPC-H Q19 shape — disjunctive band revenue: three OR-ed brand/size/
# quantity bands over a lineitem⋈part join. The join stays a plain
# equi-join on partkey; the disjunction is a residual filter. The
# part-side implication of the disjunction (brand IN + size <= 50) is
# applied BEFORE the join so Catalyst pushes it into the part scan.
# --------------------------------------------------------------------------

def q_disjunctive_band_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    pf = part.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_size") >= 1)
    ).select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .filter(band)
        .agg(
            F.count("*").alias("n_lines"),
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            ),
        )
    )


DISJUNCTIVE_BAND_REVENUE_SQL = f"""
SELECT COUNT(*) AS n_lines,
       {_sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue', 6)}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# TPC-H Q22 shape — idle rich customers: above-average balances with no
# RECENT orders (none since 2000 — strict Q22 "no orders ever" is empty
# on this testdata), summarized per nation. Scale shape: the average is
# a 1-row decimal-exact aggregate broadcast as a scalar (intentional
# 1-row BNLJ), the existence check is a left-anti shuffle join with the
# date filter pushed below it, and the nation dim is broadcast.
# --------------------------------------------------------------------------

def q_idle_rich_customers(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    rich = customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            _dec_sum(F.col("c_acctbal"), "total_acctbal"),
        )
        .orderBy("nation")
    )


IDLE_RICH_CUSTOMERS_SQL = f"""
SELECT n_name AS nation,
       COUNT(*) AS n_customers,
       {_sql_dec_sum('c_acctbal', 'total_acctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
GROUP BY n_name
ORDER BY nation
"""


# --------------------------------------------------------------------------
# TPC-H Q8 shape — national market share: of all STANDARD-part revenue
# sold to AMERICA-region customers, what fraction came from NATION_5
# suppliers, per order year. Scale shape: the small dim chains
# (part-type filter, region→nation, supplier→nation) are pruned and
# broadcast before the fact joins; the AMERICA customer subset scales
# with SF, so it carries NO broadcast hint — AQE broadcasts it at test
# scale and falls back to a custkey shuffle join at 100 TB. The only
# unavoidable fact-fact shuffle is lineitem⋈orders; the share is a
# conditional decimal sum over one aggregation pass.
# --------------------------------------------------------------------------

def q_nation_market_share(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    part = table(spark, sf_dir, "part")
    pf = part.filter(F.col("p_type") == "STANDARD").select("p_partkey")
    america_cust = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            customer.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nat = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        # pf (one p_type) and supp_nat (full supplier) scale with SF —
        # no hints; the planner broadcasts both at test scale
        li.join(pf, li.l_partkey == pf.p_partkey)
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(america_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nat, li.l_suppkey == supp_nat.s_suppkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            _dec_sum(
                F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
                    F.lit(0.0)
                ),
                "nation_revenue",
                scale=6,
            ),
            _dec_sum(rev, "total_revenue", scale=6),
        )
        .select(
            "order_year",
            "nation_revenue",
            "total_revenue",
            F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias(
                "mkt_share"
            ),
        )
        .orderBy("order_year")
    )


NATION_MARKET_SHARE_SQL = f"""
WITH agg AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
         {_sql_dec_sum("CASE WHEN sn.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 'nation_revenue', 6)},
         {_sql_dec_sum('l_extendedprice * (1 - l_discount)', 'total_revenue', 6)}
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
  GROUP BY order_year
)
SELECT order_year, nation_revenue, total_revenue,
       {_sql_round('nation_revenue / total_revenue', 6)} AS mkt_share
FROM agg
ORDER BY order_year
"""


# --------------------------------------------------------------------------
# TPC-H Q9 shape — product-line profit by supplier nation and year.
# The testdata has no partsupp/ps_supplycost, so cost is proxied as
# 60% of p_retailprice per unit (fixed, deterministic). Scale shape:
# the p_name filter prunes part before broadcasting into lineitem;
# supplier→nation is a broadcast chain; lineitem⋈orders (for the
# order year... Q9 uses shipdate year here) needs no orders join at
# all since year comes from l_shipdate — one fact shuffle total (the
# final groupBy).
# --------------------------------------------------------------------------

def q_product_profit(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part")
    pf = part.filter(F.col("p_name").like("%anvil%")).select(
        "p_partkey", "p_retailprice"
    )
    supp_nat = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        # pf (name-prefix sliver) and supp_nat (full supplier) scale
        # with SF — no hints; AQE broadcasts at test scale only
        li.join(pf, li.l_partkey == pf.p_partkey)
        .join(supp_nat, li.l_suppkey == supp_nat.s_suppkey)
        .groupBy("nation", F.year("l_shipdate").alias("ship_year"))
        .agg(_dec_sum(profit, "profit", scale=6))
        .orderBy("nation", F.desc("ship_year"))
    )


PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
       {_sql_dec_sum("l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity", 'profit', 6)}
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%anvil%'
GROUP BY n_name, ship_year
ORDER BY n_name, ship_year DESC
"""


# --------------------------------------------------------------------------
# TPC-H Q11 shape — important parts: per-part revenue through one
# nation's suppliers, keeping parts above a fraction of the nation
# total. Scale shape: the correlated scalar (total × 0.001) re-uses
# the groupBy(l_partkey) shuffle (runtime plan shows ReusedExchange —
# the fact is scanned and partially aggregated ONCE; the threshold
# branch reads the same exchange) and broadcasts the 1-row threshold.
# Decimal accumulation end-to-end so Spark and the oracle agree
# bit-for-bit.
# --------------------------------------------------------------------------

def q_important_parts(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
        supplier.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pv = (
        # nat_supp is a 1-of-25-nation supplier sliver — SF-scaling, no
        # hint; AQE broadcasts it at test scale
        li.join(nat_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(rev.cast("decimal(18,6)")).alias("value_dec"))
    )
    threshold = pv.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        pv.join(F.broadcast(threshold))
        .filter(F.col("value_dec").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


IMPORTANT_PARTS_SQL = """
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM pv
WHERE CAST(value_dec AS DOUBLE) >
      (SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.001 FROM pv)
ORDER BY part_value DESC, partkey
"""


# --------------------------------------------------------------------------
# TPC-H Q20 shape — dominant suppliers: suppliers shipping more than
# half of 1995's volume of any red part. Scale shape: the correlated
# per-part total (TPC-H's nested agg subquery) is a window SUM over
# the already-aggregated (supplier, part) rows — no second fact scan,
# no self-join. part/supplier scale with SF so neither is hinted (AQE
# broadcasts them at test scale). Two fact-sized shuffles at most:
# groupBy(supp, part), then the window's partkey exchange over grouped
# (small) data; the final supplier join keys on post-agg rows.
# --------------------------------------------------------------------------

def q_dominant_suppliers(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    pf = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    sp = (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1995-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-01-01")))
        )
        .join(pf, li.l_partkey == pf.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
    )
    part_total = F.sum("qty_dec").over(W.partitionBy("l_partkey"))
    dominant = sp.withColumn("part_total", part_total).filter(
        F.col("qty_dec").cast("double")
        > F.lit(0.5) * F.col("part_total").cast("double")
    )
    return (
        dominant.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominant_parts"))
        .join(
            supplier.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", "n_dominant_parts")
        .orderBy("s_name")
    )


DOMINANT_SUPPLIERS_SQL = """
WITH sp AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY l_suppkey, l_partkey
),
dom AS (
  SELECT l_suppkey
  FROM (
    SELECT l_suppkey, qty_dec,
           SUM(qty_dec) OVER (PARTITION BY l_partkey) AS part_total
    FROM sp
  )
  WHERE CAST(qty_dec AS DOUBLE) > 0.5 * CAST(part_total AS DOUBLE)
)
SELECT s_name, COUNT(*) AS n_dominant_parts
FROM dom JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY s_name
"""


# --------------------------------------------------------------------------
# TPC-H Q21 shape — sole-blame late suppliers: for finished
# multi-supplier orders, the one supplier whose lines shipped late
# (>90 days after the order date — the testdata has no
# commit/receipt dates) while every co-supplier shipped on time.
# Scale shape: TPC-H's EXISTS + NOT EXISTS double lineitem self-join
# collapses into two stacked aggregations — per (order, supplier)
# lateness, then per order supplier/late counts — so lineitem is
# scanned ONCE and both shuffles are on grouped (shrinking) data.
# --------------------------------------------------------------------------

def q_waiting_suppliers(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supplier = table(spark, sf_dir, "supplier")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    per_line = (
        li.join(finished, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = per_line.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    culprits = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    )
    return (
        culprits.groupBy("late_supp")
        .agg(F.count("*").alias("numwait"))
        # supplier scales with SF — no hint; the post-agg culprit side
        # is per-supplier-sized, so AQE picks the cheap side either way
        .join(
            supplier.select("s_suppkey", "s_name"),
            F.col("late_supp") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
    )


WAITING_SUPPLIERS_SQL = """
WITH per_line AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late,
         MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
  FROM per_line
  GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_order
JOIN supplier ON late_supp = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


# --------------------------------------------------------------------------
# Time-series gap fill: resample each user's irregular event series
# onto an hourly grid with linear interpolation (back-/forward-fill at
# the edges) — the hypertable/metrics-rollup shape. Scale: one shuffle
# on user_id; the spine fan-out is bounded by each user's own time
# span (never a global cross join), and both neighbor lookups are
# IGNORE NULLS window passes over the SAME sort — Spark runs them in
# one Window stage, no as-of join and no per-row subquery. All
# interpolation arithmetic is +,-,*,/ on IEEE doubles (correctly
# rounded in every engine) — deterministic without the decimal route.
# --------------------------------------------------------------------------

def q_gap_fill_interpolate(spark, sf_dir):
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("user_id", "ts", "value", "event_id")
    )
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_spine"),
        F.lit(-1).cast("bigint").alias("event_id"),
    )
    u = ev.select(
        "user_id", "ts", "value", F.lit(0).alias("is_spine"), "event_id"
    ).unionByName(spine)
    order = [F.col("ts"), F.col("is_spine"), F.col("event_id")]
    wprev = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wnext = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    ev_val = F.when(F.col("is_spine") == 0, F.col("value"))
    ev_us = F.when(F.col("is_spine") == 0, F.unix_micros(F.col("ts")))
    ann = u.select(
        "user_id",
        "ts",
        "is_spine",
        F.last(ev_val, ignorenulls=True).over(wprev).alias("prev_val"),
        F.last(ev_us, ignorenulls=True).over(wprev).alias("prev_us"),
        F.first(ev_val, ignorenulls=True).over(wnext).alias("next_val"),
        F.first(ev_us, ignorenulls=True).over(wnext).alias("next_us"),
    )
    frac = (F.unix_micros(F.col("ts")) - F.col("prev_us")) / (
        F.col("next_us") - F.col("prev_us")
    ).cast("double")
    return (
        ann.filter(F.col("is_spine") == 1)
        .select(
            "user_id",
            F.col("ts").alias("hour_ts"),
            F.when(F.col("prev_us").isNull(), F.lit("bfill"))
            .when(F.col("next_us").isNull(), F.lit("ffill"))
            .otherwise(F.lit("interp"))
            .alias("fill_kind"),
            F.round(
                F.when(F.col("prev_us").isNull(), F.col("next_val"))
                .when(F.col("next_us").isNull(), F.col("prev_val"))
                .otherwise(
                    F.col("prev_val")
                    + (F.col("next_val") - F.col("prev_val")) * frac
                ),
                6,
            ).alias("value"),
        )
        .orderBy("user_id", "hour_ts")
    )


GAP_FILL_INTERPOLATE_SQL = """
WITH ev AS (
  SELECT user_id, ts, value, event_id FROM events WHERE user_id % 20 = 0
),
bounds AS (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM ev GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS ts,
         CAST(NULL AS DOUBLE) AS value, 1 AS is_spine,
         CAST(-1 AS BIGINT) AS event_id
  FROM bounds
),
u AS (
  SELECT user_id, ts, value, 0 AS is_spine, event_id FROM ev
  UNION ALL SELECT user_id, ts, value, is_spine, event_id FROM spine
),
ann AS (
  SELECT user_id, ts, is_spine,
    LAST_VALUE(CASE WHEN is_spine = 0 THEN value END IGNORE NULLS)
      OVER wprev AS prev_val,
    LAST_VALUE(CASE WHEN is_spine = 0 THEN epoch_us(ts) END IGNORE NULLS)
      OVER wprev AS prev_us,
    FIRST_VALUE(CASE WHEN is_spine = 0 THEN value END IGNORE NULLS)
      OVER wnext AS next_val,
    FIRST_VALUE(CASE WHEN is_spine = 0 THEN epoch_us(ts) END IGNORE NULLS)
      OVER wnext AS next_us
  FROM u
  WINDOW
    wprev AS (PARTITION BY user_id ORDER BY ts, is_spine, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wnext AS (PARTITION BY user_id ORDER BY ts, is_spine, event_id
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, ts AS hour_ts,
  CASE WHEN prev_us IS NULL THEN 'bfill'
       WHEN next_us IS NULL THEN 'ffill'
       ELSE 'interp' END AS fill_kind,
  CAST(ROUND(CAST(CAST((CASE WHEN prev_us IS NULL THEN next_val WHEN next_us IS NULL THEN prev_val ELSE prev_val + (next_val - prev_val) * ((epoch_us(ts) - prev_us) / CAST(next_us - prev_us AS DOUBLE)) END) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS value
FROM ann WHERE is_spine = 1
ORDER BY user_id, hour_ts
"""


# --------------------------------------------------------------------------
# Sketch-based rolling active users: the 100 TB path for
# rolling_active_users. The exact form re-counts every (day, user)
# pair inside each trailing window — the fact-sized day-spine fan-out
# is paid on every query. The sketch form pays ONE corpus pass to a
# per-day HLL sketch (KBs/day, mergeable), then any window is a
# union-merge over the tiny per-day frame: adding a 30-day or 365-day
# window costs nothing more at the fact scan. This pre-aggregate-then-
# merge property is exactly why production rollups store sketches, not
# distinct counts (distinct counts don't add across days; sketches
# union). Graduated from a rows-only check to a full register-level
# oracle (VERDICT r5 item 6): the per-day sketch is the repo's
# hand-rolled p=12 HLL register frame (functions/sketches.py), the
# 7-day window is a register-wise MAX merge, and the DuckDB oracle
# replays both the registers and the estimates bit-for-bit.
# --------------------------------------------------------------------------

def q_approx_rolling_users(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    b, rho = hll_bucket_rho(F.col("user_id"))
    # Per-(day, register) max rank: one map-side partial-max pass;
    # frame size = days × ≤4096 regardless of event volume.
    regs = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            b.alias("b"),
            rho.alias("rho"),
        )
        .groupBy("day", "b")
        .agg(F.max("rho").alias("m_j"))
    )
    regs = regs.localCheckpoint(eager=False)

    def _est(frame, out):
        per = frame.groupBy("day").agg(
            F.count("*").alias("v_obs"),
            F.sum(F.expr("shiftleft(1L, 49 - m_j)")).alias("s_obs"),
        )
        return per.select(
            "day",
            F.round(
                hll_estimate(F.col("v_obs"), F.col("s_obs")), 4
            ).alias(out),
        )

    est_dau = _est(regs, "est_dau")
    # Trailing-7d union = register-wise MAX across the day range; the
    # day spine is tiny → broadcast, so the register frame never
    # shuffles for the window.
    merged = (
        regs.alias("p")
        .join(
            F.broadcast(regs.select("day").distinct().alias("d")),
            (F.col("p.day") <= F.col("d.day"))
            & (F.col("p.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("p.b").alias("b"))
        .agg(F.max("p.m_j").alias("m_j"))
    )
    est_wau = _est(merged, "est_wau7")
    return (
        est_dau.join(est_wau, "day")
        .select("day", "est_dau", "est_wau7")
        .orderBy("day")
    )


def _approx_rolling_users_sql() -> str:
    from city_payroll_data_pipeline_spark.functions.sketches import (
        HLL_ALPHA,
        HLL_C49,
        HLL_M,
    )

    est = (
        f"CASE WHEN raw <= 2.5 * {HLL_M} AND v_empty > 0 "
        f"THEN {HLL_M} * "
        + _sql_round(
            f"ln(CAST({HLL_M} AS DOUBLE) / CAST(v_empty AS DOUBLE))", 8
        )
        + " ELSE raw END"
    )
    raw = (
        f"CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}"
        f" * (CAST({HLL_C49} AS DOUBLE)"
        f" / CAST(s_obs + ({HLL_M} - v_obs)"
        f" * CAST({HLL_C49} AS BIGINT) AS DOUBLE))"
    )
    return f"""
WITH hashed AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 3) AS INT)
           AS b,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 4, 12) AS BIGINT)
           AS v48
  FROM events
),
regs AS (
  SELECT day, b,
         MAX(CASE WHEN v48 = 0 THEN 49 ELSE 49 - length(bin(v48)) END) AS m_j
  FROM hashed GROUP BY day, b
),
dau_p AS (
  SELECT day, COUNT(*) AS v_obs,
         CAST(SUM(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT) AS s_obs
  FROM regs GROUP BY day
),
dau AS (
  SELECT day, {est} AS est
  FROM (SELECT day, {raw} AS raw, {HLL_M} - v_obs AS v_empty FROM dau_p)
),
merged AS (
  SELECT d.day AS day, p.b AS b, MAX(p.m_j) AS m_j
  FROM regs p
  JOIN (SELECT DISTINCT day FROM regs) d
    ON p.day <= d.day AND p.day >= d.day - INTERVAL 6 DAY
  GROUP BY d.day, p.b
),
wau_p AS (
  SELECT day, COUNT(*) AS v_obs,
         CAST(SUM(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT) AS s_obs
  FROM merged GROUP BY day
),
wau AS (
  SELECT day, {est} AS est
  FROM (SELECT day, {raw} AS raw, {HLL_M} - v_obs AS v_empty FROM wau_p)
)
SELECT dau.day AS day,
       {_sql_round('dau.est', 4)} AS est_dau,
       {_sql_round('wau.est', 4)} AS est_wau7
FROM dau JOIN wau USING (day)
ORDER BY day
"""


# --------------------------------------------------------------------------
# Per-user EWMA: exponentially weighted moving average of event values
# — the smoothing/anomaly-baseline primitive Spark has no built-in
# for (no ordered-recursive aggregate). Re-expressed as a per-key
# ordered fold: collect the user's series once (bounded by per-user
# cardinality, never corpus-sized), then a codegen'd F.aggregate
# replays acc = α·x + (1−α)·acc in (ts, event_id) order. One shuffle
# on user_id. Both engines fold the SAME sequence with the SAME IEEE
# ops left-to-right, so the result is bit-deterministic — the oracle
# replays it with DuckDB's list_reduce. At 100 TB a user's history is
# KBs; for pathological hot keys, pre-aggregate per (user, hour)
# before folding.
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.3


def q_ewma_user_value(spark, sf_dir):
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    arr = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("s")
    )
    vals = F.transform(F.col("s"), lambda x: x["value"])
    a = F.lit(_EWMA_ALPHA)
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
    )
    return arr.select(
        "user_id",
        F.size("s").alias("n_events"),
        F.round(ewma, 6).alias("ewma_value"),
    ).orderBy("user_id")


EWMA_USER_VALUE_SQL = f"""
WITH arr AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id) AS vals
  FROM events WHERE user_id % 10 = 0
  GROUP BY user_id
)
SELECT user_id, len(vals) AS n_events,
       CAST(ROUND(CAST(CAST((list_reduce(vals, (acc, x) -> {_EWMA_ALPHA} * x + {1.0 - _EWMA_ALPHA} * acc)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
         AS ewma_value
FROM arr ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Range-sharded ordered export (operators/sharding.py): the at-scale
# generalization of the reference's ORDER BY full export — explicit
# exact-quantile shard boundaries, branch-free shard tagging, hive
# write partitioned by shard with per-file sort. The suite query
# returns the per-shard manifest (count + key range); non-overlapping
# ranges + equal counts ARE the correctness property of the layout.
# --------------------------------------------------------------------------

_N_EXPORT_SHARDS = 8


def q_range_sharded_export(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators import sharding

    orders = table(spark, sf_dir, "orders")
    bounds = sharding.range_shard_boundaries(
        orders, "o_totalprice", _N_EXPORT_SHARDS
    )
    return (
        sharding.assign_range_shards(orders, "o_totalprice", bounds)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("shard")
    )


def _range_sharded_export_sql() -> str:
    n = _N_EXPORT_SHARDS
    qs = ", ".join(str(i / n) for i in range(1, n))
    # boundary rounds go through _sql_round: a 1-ulp disagreement with
    # Spark's F.round on an exact .xx5 cut would reassign every
    # boundary-straddling row to a different shard
    shard = " + ".join(
        "CASE WHEN o_totalprice >= "
        + _sql_round(f"q[{i}]", 6)
        + " THEN 1 ELSE 0 END"
        for i in range(1, n)
    )
    return f"""
WITH b AS (
  SELECT quantile_cont(o_totalprice, [{qs}]) AS q FROM orders
),
tagged AS (
  SELECT o_totalprice, CAST({shard} AS INTEGER) AS shard
  FROM orders, b
)
SELECT shard, COUNT(*) AS n_rows,
       CAST(ROUND(CAST(CAST((MIN(o_totalprice)) AS VARCHAR) AS DECIMAL(38,20)), 2) AS DOUBLE) AS lo,
       CAST(ROUND(CAST(CAST((MAX(o_totalprice)) AS VARCHAR) AS DECIMAL(38,20)), 2) AS DOUBLE) AS hi
FROM tagged GROUP BY shard ORDER BY shard
"""


RANGE_SHARDED_EXPORT_SQL = _range_sharded_export_sql()


# --------------------------------------------------------------------------
# SCD2 dimension history (operators/scd.py): bootstrap a customer
# dimension at T1, merge a synthesized T2 snapshot (every 5th key
# changes market segment, every 13th key spawns a brand-new customer),
# and return the full history with validity intervals. Deterministic
# in-plan update synthesis (same device as corpus_snapshot_diff) so
# both engines merge identical inputs. The only shuffle is the
# current⟗updates key join; closed history never enters an exchange.
# --------------------------------------------------------------------------

_SCD_T1 = "2024-01-01 00:00:00"
_SCD_T2 = "2024-06-01 00:00:00"
# point-in-time variant: interval boundary inside the orders date range
# (testdata orders span 1995..2001) so the as-of join exercises both
# dimension versions
_PIT_T1 = "1995-01-01 00:00:00"
_PIT_T2 = "1998-01-01 00:00:00"


def _scd2_customer_history(spark, sf_dir, t1, t2):
    """Shared fixture: bootstrap the customer dim at t1, merge a
    deterministic t2 snapshot (every 5th key changes segment, every
    13th spawns a new key)."""
    from city_payroll_data_pipeline_spark.operators import scd

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    hist = scd.scd2_init(cust, t1)
    upd = cust.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 5 == 0,
            F.concat(F.lit("MOVED:"), F.col("c_mktsegment")),
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_nationkey",
    ).unionByName(
        cust.filter(F.col("c_custkey") % 13 == 0).select(
            (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
            F.lit("NEW").alias("c_mktsegment"),
            F.col("c_nationkey"),
        )
    )
    return scd.scd2_merge(
        hist, upd, "c_custkey", ["c_mktsegment", "c_nationkey"], t2
    )


def q_scd2_customer_history(spark, sf_dir):
    return _scd2_customer_history(spark, sf_dir, _SCD_T1, _SCD_T2).orderBy(
        "c_custkey", "valid_from"
    )


def q_orders_pit_segment(spark, sf_dir):
    """Point-in-time attribution over the SCD2 history: revenue by the
    market segment each customer was in WHEN the order was placed —
    orders before the T2 segment change attribute to the old segment,
    later ones to the new. The join is equi-on-key with the validity
    interval as a post-join filter (operators/scd.py::as_of_lookup);
    fan-out is bounded by versions-per-key (2 here), never table
    size."""
    from city_payroll_data_pipeline_spark.operators import scd

    hist = _scd2_customer_history(spark, sf_dir, _PIT_T1, _PIT_T2)
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    pit = scd.as_of_lookup(
        orders, hist, key="c_custkey", fact_key="o_custkey",
        ts_col="o_orderdate", how="inner",
    )
    return (
        pit.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "revenue"),
        )
        .orderBy("segment")
    )


def _scd2_hist_cte(t1: str, t2: str) -> str:
    """CTE block replaying the shared SCD2 fixture in DuckDB."""
    return f"""
cust AS (
  SELECT c_custkey, c_mktsegment, c_nationkey FROM customer
),
upd AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN 'MOVED:' || c_mktsegment
              ELSE c_mktsegment END AS c_mktsegment,
         c_nationkey
  FROM cust
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW', c_nationkey
  FROM cust WHERE c_custkey % 13 = 0
),
flags AS (
  SELECT c.c_custkey,
         (u.c_mktsegment IS DISTINCT FROM c.c_mktsegment
          OR u.c_nationkey IS DISTINCT FROM c.c_nationkey) AS changed
  FROM cust c JOIN upd u ON u.c_custkey = c.c_custkey
),
hist AS (
  SELECT c.c_custkey, c.c_mktsegment, c.c_nationkey,
         TIMESTAMP '{t1}' AS valid_from,
         CASE WHEN f.changed THEN TIMESTAMP '{t2}' END AS valid_to,
         NOT f.changed AS is_current
  FROM cust c JOIN flags f ON f.c_custkey = c.c_custkey
  UNION ALL
  SELECT u.c_custkey, u.c_mktsegment, u.c_nationkey,
         TIMESTAMP '{t2}' AS valid_from,
         NULL AS valid_to,
         TRUE AS is_current
  FROM upd u LEFT JOIN cust c ON c.c_custkey = u.c_custkey
  LEFT JOIN flags f ON f.c_custkey = u.c_custkey
  WHERE c.c_custkey IS NULL OR f.changed
)"""


SCD2_CUSTOMER_HISTORY_SQL = f"""
WITH {_scd2_hist_cte(_SCD_T1, _SCD_T2)}
SELECT * FROM hist
ORDER BY c_custkey, valid_from
"""

ORDERS_PIT_SEGMENT_SQL = f"""
WITH {_scd2_hist_cte(_PIT_T1, _PIT_T2)}
SELECT h.c_mktsegment AS segment,
       COUNT(*) AS n_orders,
       {_sql_dec_sum('o_totalprice', 'revenue')}
FROM orders o
JOIN hist h ON h.c_custkey = o.o_custkey
           AND o.o_orderdate >= h.valid_from
           AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
GROUP BY segment
ORDER BY segment
"""


# --------------------------------------------------------------------------
# referential_integrity_audit — orphan counts across every FK edge.
#
# The pre-join data-quality gate a warehouse runs after every load:
# for each foreign-key edge of the star schema, how many fact rows
# (and distinct keys) reference a missing dimension row. One row per
# edge; all-zero orphans is the expected healthy readout.
#
# Scale: each edge is one LEFT join probing a DISTINCT-key dim frame
# — small dims broadcast, the two fact-sized edges shuffle once on
# their key; counts partial-aggregate map-side. At 100 TB run the
# fact-side edges in one multi-join pass per fact table (same plan
# per edge, shared scan via caching) — the per-edge plan shape is
# unchanged.
# --------------------------------------------------------------------------


def q_referential_integrity_audit(spark, sf_dir):
    tabs = {
        name: table(spark, sf_dir, name)
        for name in (
            "lineitem", "orders", "customer", "part", "supplier",
            "nation", "region",
        )
    }
    edges = [
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
    ]
    out = None
    for edge, fact, fk, dim, pk in edges:
        j = tabs[fact].select(F.col(fk).alias("fk")).join(
            tabs[dim].select(F.col(pk).alias("dk")).distinct(),
            F.col("fk") == F.col("dk"),
            "left",
        )
        stats = j.agg(
            F.count("*").alias("fact_rows"),
            F.count_if(F.col("dk").isNull()).alias("orphan_rows"),
            F.count_distinct(
                F.when(F.col("dk").isNull(), F.col("fk"))
            ).alias("orphan_keys"),
        ).select(F.lit(edge).alias("fk_edge"), "*")
        out = stats if out is None else out.unionAll(stats)
    return out.orderBy("fk_edge")


def _ri_edge_sql(edge, fact, fk, dim, pk):
    return f"""
SELECT '{edge}' AS fk_edge,
       COUNT(*) AS fact_rows,
       CAST(COUNT(*) FILTER (WHERE d.dk IS NULL) AS BIGINT) AS orphan_rows,
       COUNT(DISTINCT CASE WHEN d.dk IS NULL THEN f.fk END) AS orphan_keys
FROM (SELECT {fk} AS fk FROM {fact}) f
LEFT JOIN (SELECT DISTINCT {pk} AS dk FROM {dim}) d ON f.fk = d.dk
"""


REFERENTIAL_INTEGRITY_SQL = (
    "\nUNION ALL\n".join(
        _ri_edge_sql(*e)
        for e in [
            ("customer.c_nationkey->nation", "customer", "c_nationkey",
             "nation", "n_nationkey"),
            ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
             "orders", "o_orderkey"),
            ("lineitem.l_partkey->part", "lineitem", "l_partkey",
             "part", "p_partkey"),
            ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
             "supplier", "s_suppkey"),
            ("nation.n_regionkey->region", "nation", "n_regionkey",
             "region", "r_regionkey"),
            ("orders.o_custkey->customer", "orders", "o_custkey",
             "customer", "c_custkey"),
            ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
             "nation", "n_nationkey"),
        ]
    )
    + "\nORDER BY fk_edge"
)


# --------------------------------------------------------------------------
# part_pareto_frontier — the skyline without the O(n²) dominance join.
#
# "Which parts are Pareto-optimal on (bigger size, lower price)?" —
# the multi-criteria shortlist query (skyline operator). The naive
# formulation is a NOT EXISTS self-join (O(n²)); for a 2-criteria
# skyline the monotone structure collapses it to a DISTINCT-SIZE
# cumulative minimum. A part survives iff (a) it is the cheapest at
# its own size (price = size_min — a same-size cheaper part strictly
# dominates) AND (b) every strictly larger size is strictly more
# expensive (price < best_above — a larger-size part at equal-or-
# lower price dominates too: strictly better in size, no worse in
# price). Requiring only (b) with <= kept parts dominated at their
# own size — 39 of 44 returned rows at sf0.01 were dominated.
# Prices compare as exact DECIMAL(12,2).
#
# Scale: one groupBy on size (cardinality ≪ parts), one window over
# the distinct-size frame, one broadcast join back — the corpus
# crosses a single exchange.
# --------------------------------------------------------------------------


def q_part_pareto_frontier(spark, sf_dir):
    part = table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.col("p_retailprice").cast("decimal(12,2)").alias("price"),
    )
    per_size = part.groupBy("p_size").agg(F.min("price").alias("size_min"))
    w = W.orderBy(F.desc("p_size")).rowsBetween(W.unboundedPreceding, -1)
    best = per_size.withColumn("best_above", F.min("size_min").over(w))
    frontier = part.join(
        F.broadcast(best.select("p_size", "size_min", "best_above")),
        "p_size",
    ).filter(
        (F.col("price") == F.col("size_min"))
        & (
            F.col("best_above").isNull()
            | (F.col("price") < F.col("best_above"))
        )
    )
    return frontier.select(
        "p_partkey", "p_size", F.col("price").cast("double").alias("price")
    ).orderBy(F.desc("p_size"), F.asc("price"), F.asc("p_partkey"))


PART_PARETO_FRONTIER_SQL = """
WITH per_size AS (
  SELECT p_size, MIN(CAST(p_retailprice AS DECIMAL(12,2))) AS size_min
  FROM part GROUP BY p_size
),
best AS (
  SELECT p_size, size_min,
         MIN(size_min) OVER (ORDER BY p_size DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_above
  FROM per_size
)
SELECT p_partkey, p_size,
       CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price
FROM part JOIN best USING (p_size)
WHERE CAST(p_retailprice AS DECIMAL(12,2)) = size_min
  AND (best_above IS NULL
       OR CAST(p_retailprice AS DECIMAL(12,2)) < best_above)
ORDER BY p_size DESC, price, p_partkey
"""


# --------------------------------------------------------------------------
# session_window_stats — Spark's NATIVE session windows (the streaming-
# ready sessionizer).
#
# event_sessions builds gap sessions by hand (lag + cumsum) — the
# audit-grade batch form. ``F.session_window`` is the engine-native
# equivalent whose groupBy works IDENTICALLY under Structured
# Streaming (state + watermark eviction for free), so this query is
# the batch twin of the streaming sessionizer. Semantics differ from
# the lag form at the boundary: session_window merges events whose
# [t, t+gap) windows OVERLAP, so a gap of EXACTLY 1h starts a new
# session (>=, not >) — the oracle replays that rule on exact epoch
# micros. Per-session duration = window_end − window_start − gap =
# last − first, all integer micros.
#
# Scale: one shuffle on user_id (the session assignment is a sort
# within user partitions), one per-user rollup; under streaming the
# same plan holds per micro-batch with watermark-bounded state.
# --------------------------------------------------------------------------

_SW_GAP_S = 3600


def q_session_window_stats(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    sess = ev.groupBy(
        "user_id",
        F.session_window("ts", f"{_SW_GAP_S} seconds").alias("w"),
    ).agg(F.count("*").alias("n_events"))
    dur_us = (
        F.unix_micros(F.col("w.end"))
        - F.unix_micros(F.col("w.start"))
        - _SW_GAP_S * 1_000_000
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
            F.sum(dur_us).alias("total_active_us"),
        )
        .orderBy("user_id")
    )


SESSION_WINDOW_STATS_SQL = f"""
WITH us AS (
  SELECT user_id, event_id, epoch_us(ts) AS u FROM events
),
flagged AS (
  SELECT user_id, u, event_id,
         CASE WHEN lag(u) OVER w IS NULL
                OR u - lag(u) OVER w >= CAST({_SW_GAP_S} AS BIGINT) * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM us
  WINDOW w AS (PARTITION BY user_id ORDER BY u, event_id)
),
numbered AS (
  -- event_id tiebreak: same-microsecond rows must number in the same
  -- order both engines' flagged windows used (see EVENT_SESSIONS_SQL)
  SELECT user_id, u,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY u, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
sess AS (
  SELECT user_id, sid, COUNT(*) AS n_events,
         MAX(u) - MIN(u) AS dur_us
  FROM numbered GROUP BY user_id, sid
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       MAX(n_events) AS max_session_events,
       CAST(SUM(dur_us) AS BIGINT) AS total_active_us
FROM sess
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "session_window_stats": Query(
        q_session_window_stats,
        SESSION_WINDOW_STATS_SQL,
        ("window", "sessionize", "session-window", "streaming-twin"),
    ),
    "referential_integrity_audit": Query(
        q_referential_integrity_audit,
        REFERENTIAL_INTEGRITY_SQL,
        ("dq", "foreign-key", "audit"),
    ),
    "part_pareto_frontier": Query(
        q_part_pareto_frontier,
        PART_PARETO_FRONTIER_SQL,
        ("skyline", "pareto", "window"),
    ),
    "region_revenue": Query(q_region_revenue, REGION_REVENUE_SQL, ("join", "broadcast")),
    "range_sharded_export": Query(
        q_range_sharded_export,
        RANGE_SHARDED_EXPORT_SQL,
        ("export", "sharding", "terasort"),
    ),
    "gap_fill_interpolate": Query(
        q_gap_fill_interpolate,
        GAP_FILL_INTERPOLATE_SQL,
        ("timeseries", "resample", "interpolate", "window"),
    ),
    "ewma_user_value": Query(
        q_ewma_user_value,
        EWMA_USER_VALUE_SQL,
        ("timeseries", "ewma", "fold"),
    ),
    "approx_rolling_users": Query(
        q_approx_rolling_users,
        _approx_rolling_users_sql(),
        ("sketch", "hll", "mergeable", "rolling"),
    ),
    "order_lineitem_join": Query(
        q_order_lineitem_join, ORDER_LINEITEM_JOIN_SQL, ("join", "shuffle")
    ),
    "customers_without_orders": Query(
        q_customers_without_orders, CUSTOMERS_WITHOUT_ORDERS_SQL, ("join", "anti")
    ),
    "customers_with_orders_semi": Query(
        q_customers_with_orders_semi, CUSTOMERS_WITH_ORDERS_SEMI_SQL, ("join", "semi")
    ),
    "pricing_summary": Query(q_pricing_summary, PRICING_SUMMARY_SQL, ("agg", "tpch_q1")),
    "top_orders_per_priority": Query(
        q_top_orders_per_priority, TOP_ORDERS_PER_PRIORITY_SQL, ("window", "rank")
    ),
    "user_running_value": Query(
        q_user_running_value, USER_RUNNING_VALUE_SQL, ("window", "running")
    ),
    "event_sessionize_asof": Query(
        q_event_sessionize_asof, EVENT_SESSIONIZE_ASOF_SQL, ("window", "asof")
    ),
    "hourly_event_stats": Query(
        q_hourly_event_stats, HOURLY_EVENT_STATS_SQL, ("agg", "time_bucket")
    ),
    "set_ops_customers": Query(q_set_ops_customers, SET_OPS_CUSTOMERS_SQL, ("setops",)),
    "rollup_priority_status": Query(
        q_rollup_priority_status, ROLLUP_PRIORITY_STATUS_SQL, ("rollup",)
    ),
    "pivot_status_by_priority": Query(
        q_pivot_status_by_priority, PIVOT_STATUS_BY_PRIORITY_SQL, ("pivot",)
    ),
    "distinct_counts": Query(q_distinct_counts, DISTINCT_COUNTS_SQL, ("agg", "distinct")),
    "cube_priority_status": Query(
        q_cube_priority_status, CUBE_PRIORITY_STATUS_SQL, ("cube",)
    ),
    "grouping_sets_revenue": Query(
        q_grouping_sets_revenue, GROUPING_SETS_REVENUE_SQL, ("grouping_sets",)
    ),
    "group_percentiles": Query(
        q_group_percentiles, GROUP_PERCENTILES_SQL, ("agg", "percentile")
    ),
    "price_band_range_join": Query(
        q_price_band_range_join, PRICE_BAND_RANGE_JOIN_SQL, ("join", "range")
    ),
    "shipping_priority_topk": Query(
        q_shipping_priority_topk, SHIPPING_PRIORITY_TOPK_SQL, ("join", "tpch_q3", "topk")
    ),
    "events_asof_last_order": Query(
        q_events_asof_last_order, EVENTS_ASOF_LAST_ORDER_SQL, ("join", "asof")
    ),
    "events_asof_next_order": Query(
        q_events_asof_next_order,
        EVENTS_ASOF_NEXT_ORDER_SQL,
        ("join", "asof", "forward", "tolerance"),
    ),
    "fulfillment_islands": Query(
        q_fulfillment_islands,
        FULFILLMENT_ISLANDS_SQL,
        ("window", "gaps-and-islands", "interval-union"),
    ),
    "event_sessions": Query(
        q_event_sessions, EVENT_SESSIONS_SQL, ("window", "sessionize")
    ),
    "session_overlap_pairs": Query(
        q_session_overlap_pairs,
        SESSION_OVERLAP_PAIRS_SQL,
        ("interval-join", "bucketed", "sessionize"),
    ),
    "watermark_lateness_audit": Query(
        q_watermark_lateness_audit,
        WATERMARK_LATENESS_AUDIT_SQL,
        ("streaming-ops", "watermark", "window", "audit"),
    ),
    "customer_order_windows": Query(
        q_customer_order_windows,
        CUSTOMER_ORDER_WINDOWS_SQL,
        ("window", "lag", "lead", "ntile", "range_frame"),
    ),
    "status_sets_by_priority": Query(
        q_status_sets_by_priority, STATUS_SETS_BY_PRIORITY_SQL, ("agg", "collect_set")
    ),
    "conditional_agg_mix": Query(
        q_conditional_agg_mix, CONDITIONAL_AGG_MIX_SQL, ("agg", "filter_clause")
    ),
    "orders_by_month": Query(
        q_orders_by_month, ORDERS_BY_MONTH_SQL, ("agg", "datetime")
    ),
    "string_formatting": Query(
        q_string_formatting, STRING_FORMATTING_SQL, ("project", "strings")
    ),
    "lineitem_profile": Query(
        q_lineitem_profile, LINEITEM_PROFILE_SQL, ("quality", "profile")
    ),
    "lineitem_dq_checks": Query(
        q_lineitem_dq_checks, LINEITEM_DQ_CHECKS_SQL, ("quality", "rules")
    ),
    "time_rollup_multires": Query(
        q_time_rollup_multires, TIME_ROLLUP_MULTIRES_SQL, ("grouping_sets", "time")
    ),
    "approx_distinct_stats": Query(
        q_approx_distinct_stats,
        _approx_distinct_stats_sql(),
        ("agg", "sketch", "hll"),
    ),
    "json_event_props": Query(q_json_event_props, JSON_EVENT_PROPS_SQL, ("json",)),
    "revenue_forecast": Query(
        q_revenue_forecast, REVENUE_FORECAST_SQL, ("agg", "tpch_q6", "pushdown")
    ),
    "holt_linear_forecast": Query(
        q_holt_linear_forecast,
        HOLT_LINEAR_FORECAST_SQL,
        ("time-series", "forecast", "fold", "integer-exact"),
    ),
    "holt_winters_seasonal": Query(
        q_holt_winters_seasonal,
        HOLT_WINTERS_SEASONAL_SQL,
        ("time-series", "forecast", "seasonal", "fold", "integer-exact"),
    ),
    "priority_order_check": Query(
        q_priority_order_check,
        PRIORITY_ORDER_CHECK_SQL,
        ("join", "tpch_q4", "semi"),
    ),
    "order_price_distribution": Query(
        q_order_price_distribution,
        ORDER_PRICE_DISTRIBUTION_SQL,
        ("window", "percent_rank", "cume_dist"),
    ),
    "event_funnel": Query(
        q_event_funnel, EVENT_FUNNEL_SQL, ("funnel", "higher_order_fold")
    ),
    "error_spikes": Query(
        q_error_spikes, ERROR_SPIKES_SQL, ("window", "ops", "anomaly")
    ),
    "rolling_active_users": Query(
        q_rolling_active_users,
        ROLLING_ACTIVE_USERS_SQL,
        ("analytics", "distinct", "sliding-window"),
    ),
    "local_supplier_volume": Query(
        q_local_supplier_volume,
        LOCAL_SUPPLIER_VOLUME_SQL,
        ("join", "tpch", "q5"),
    ),
    "nation_trade_flows": Query(
        q_nation_trade_flows, NATION_TRADE_FLOWS_SQL, ("join", "tpch", "q7")
    ),
    "returned_items_top_customers": Query(
        q_returned_items_top_customers,
        RETURNED_ITEMS_TOP_CUSTOMERS_SQL,
        ("join", "topk", "tpch", "q10"),
    ),
    "late_shipment_priority": Query(
        q_late_shipment_priority,
        LATE_SHIPMENT_PRIORITY_SQL,
        ("join", "conditional-agg", "tpch", "q12"),
    ),
    "promo_revenue_share": Query(
        q_promo_revenue_share, PROMO_REVENUE_SHARE_SQL, ("join", "tpch", "q14")
    ),
    "top_supplier_revenue": Query(
        q_top_supplier_revenue, TOP_SUPPLIER_REVENUE_SQL, ("join", "tpch", "q15")
    ),
    "small_quantity_revenue": Query(
        q_small_quantity_revenue,
        SMALL_QUANTITY_REVENUE_SQL,
        ("join", "tpch", "q17"),
    ),
    "disjunctive_band_revenue": Query(
        q_disjunctive_band_revenue,
        DISJUNCTIVE_BAND_REVENUE_SQL,
        ("join", "pushdown", "tpch", "q19"),
    ),
    "idle_rich_customers": Query(
        q_idle_rich_customers,
        IDLE_RICH_CUSTOMERS_SQL,
        ("anti-join", "scalar-subquery", "tpch", "q22"),
    ),
    "nation_market_share": Query(
        q_nation_market_share, NATION_MARKET_SHARE_SQL, ("join", "tpch", "q8")
    ),
    "product_profit": Query(
        q_product_profit, PRODUCT_PROFIT_SQL, ("join", "tpch", "q9")
    ),
    "important_parts": Query(
        q_important_parts,
        IMPORTANT_PARTS_SQL,
        ("agg", "scalar-subquery", "tpch", "q11"),
    ),
    "dominant_suppliers": Query(
        q_dominant_suppliers,
        DOMINANT_SUPPLIERS_SQL,
        ("window", "correlated-agg", "tpch", "q20"),
    ),
    "waiting_suppliers": Query(
        q_waiting_suppliers,
        WAITING_SUPPLIERS_SQL,
        ("agg", "stacked-agg", "tpch", "q21"),
    ),
    "join_key_skew": Query(
        q_join_key_skew, JOIN_KEY_SKEW_SQL, ("diagnostic", "skew", "topk")
    ),
    "scd2_customer_history": Query(
        q_scd2_customer_history,
        SCD2_CUSTOMER_HISTORY_SQL,
        ("scd2", "merge", "dimension-history"),
    ),
    "orders_pit_segment": Query(
        q_orders_pit_segment,
        ORDERS_PIT_SEGMENT_SQL,
        ("scd2", "point-in-time", "as-of", "attribution"),
    ),
    "lineitem_quarantine": Query(
        q_lineitem_quarantine,
        LINEITEM_QUARANTINE_SQL,
        ("quality", "quarantine", "routing"),
    ),
    "winsorized_price_stats": Query(
        q_winsorized_price_stats,
        WINSORIZED_PRICE_STATS_SQL,
        ("agg", "robust", "percentile"),
    ),
    "customer_order_distribution": Query(
        q_customer_order_distribution,
        CUSTOMER_ORDER_DISTRIBUTION_SQL,
        ("join", "outer", "tpch_q13"),
    ),
    "large_volume_customers": Query(
        q_large_volume_customers,
        LARGE_VOLUME_CUSTOMERS_SQL,
        ("join", "having", "tpch_q18"),
    ),
    "cheapest_supplier_per_part": Query(
        q_cheapest_supplier_per_part,
        CHEAPEST_SUPPLIER_PER_PART_SQL,
        ("window", "argmin", "tpch_q2"),
    ),
    "parts_supplier_counts": Query(
        q_parts_supplier_counts,
        PARTS_SUPPLIER_COUNTS_SQL,
        ("agg", "distinct", "tpch_q16"),
    ),
    "cohort_retention": Query(
        q_cohort_retention, COHORT_RETENTION_SQL, ("cohort", "retention")
    ),
}

# budget_report_salted shares budget_report's oracle (identical semantics,
# skew-resistant physical plan).
from city_payroll_data_pipeline_spark.suite.parity import BUDGET_REPORT_SQL  # noqa: E402

QUERIES["budget_report_salted"] = Query(
    q_budget_report_salted, BUDGET_REPORT_SQL, ("agg", "skew", "salted")
)

# the salted join shares the plain join's oracle (salt affects only
# row placement, never results)
QUERIES["order_lineitem_join_salted"] = Query(
    q_order_lineitem_join_salted, ORDER_LINEITEM_JOIN_SQL, ("join", "skew", "salted")
)
