"""Relational query surface (SURVEY.md §2.3-2.8).

TPC-H-shaped queries over the driver's tables, each paired with a DuckDB
oracle. These exercise: parquet scans with pushdown, equality/range/
regex/in-list predicates, all join types (inner/left/semi/anti +
broadcast), hash aggregation, distinct aggregation, rollup, window
functions (row_number/lag/running sums), sorts, limits, set operations,
and the scalar string/date function battery the reference uses
(/root/reference/incremental_kafka_s3_cdc.py §2.8: rlike, isin,
regexp_extract, coalesce, concat, substr, when/otherwise, date_format).

Determinism rules: see registry module docstring (decimal-accumulated
double aggregates; total orders under every LIMIT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import (
    davg,
    dec,
    dsum,
    query,
    sql_davg,
    sql_dsum,
)


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV = "l_extendedprice*(1-l_discount)"


# ---------------------------------------------------------------------------
# q01 — pricing summary (scan → filter → hash agg → 8 aggregates)
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum(_REV, 'sum_disc_price', 6)},
           {sql_dsum(f'{_REV}*(1+l_tax)', 'sum_charge', 6)},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc', 4)},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = rev * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(rev, "sum_disc_price", 6),
            dsum(charge, "sum_charge", 6),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc", 4),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q03 — shipping priority (3-way join → agg → total-order top-10)
# ---------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum(_REV, 'revenue', 6)},
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    l = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(rev, "revenue", 6))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q05 — regional revenue (6-way star join with broadcast dims)
# ---------------------------------------------------------------------------
@query(
    "q05_region_revenue",
    oracle=f"""
    SELECT n_name, {sql_dsum(_REV, 'revenue', 6)}
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = T(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = T(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        T(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            T(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(rev, "revenue", 6))
    )


# ---------------------------------------------------------------------------
# q06 — forecast revenue (pushdown-friendly scalar aggregate)
# ---------------------------------------------------------------------------
@query(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice*l_discount', 'revenue', 6)}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", 6))
    )


# ---------------------------------------------------------------------------
# q10 — returned items (join + agg + top-20)
# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {sql_dsum(_REV, 'revenue', 6)}, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            T(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(T(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev, "revenue", 6))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q14 — promo revenue share (conditional aggregate over a join)
# ---------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT
      CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST({_REV} AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        AS promo_revenue,
      {sql_dsum(_REV, 'total_revenue', 6)}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    p = T(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", dec(rev, 6)).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            dsum(rev, "total_revenue", 6),
        )
    )


# ---------------------------------------------------------------------------
# q18 — large orders (agg → having → join → top-k)
# ---------------------------------------------------------------------------
@query(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {sql_dsum('l_quantity', 'sum_qty')}
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
    )
    SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           o_totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("__sum_dec"))
        .filter(F.col("__sum_dec") > 200)
        .select(
            "l_orderkey", F.col("__sum_dec").cast("double").alias("sum_qty")
        )
    )
    return (
        big.join(
            T(spark, sf_dir, "orders"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            T(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# joins: outer / semi / anti
# ---------------------------------------------------------------------------
@query(
    "q_customer_order_counts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving order-less customers (count = 0)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)")
            ).cast("double").alias("total_spend"),
        )
    )


@query(
    "q_urgent_customers_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
    """,
)
def q_urgent_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (existence test without multiplying rows)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_mktsegment")


@query(
    "q_rich_customers_no_orders",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    """,
)
def q_rich_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery threshold + left-anti join (TPC-H q22 shape):
    above-average-balance customers with no *recent* (1999+) orders."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    )
    threshold = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal"))
            .alias("__avg_bal")
        )
    )
    return (
        c.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# grouping extensions: rollup, distinct agg
# ---------------------------------------------------------------------------
@query(
    "q_rollup_lineitem_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    return (
        T(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty"))
    )


@query(
    "q_distinct_customers_per_status",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# set operations (union / intersect / except, SURVEY.md §2.7)
# ---------------------------------------------------------------------------
@query(
    "q_setops_active_buyers",
    oracle="""
    SELECT custkey FROM (
      (SELECT o_custkey AS custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
       UNION
       SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01')
      INTERSECT
      SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01'
    ) EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union-distinct → intersect → except over customer key sets."""
    o = T(spark, sf_dir, "orders")

    def buyers(y0: str, y1: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp_ntz"))
            )
            .select(F.col("o_custkey").alias("custkey"))
        )

    b95, b96, b97 = (
        buyers("1995-01-01", "1996-01-01"),
        buyers("1996-01-01", "1997-01-01"),
        buyers("1997-01-01", "1998-01-01"),
    )
    whales = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    return b95.union(b96).distinct().intersect(b97).subtract(whales)


# ---------------------------------------------------------------------------
# scalar function battery (string ops, SURVEY.md §2.8)
# ---------------------------------------------------------------------------
@query(
    "q_scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_mktsegment) AS seg_upper,
           SUBSTR(c_name, 1, 9) AS name_prefix,
           c_name || '#' || c_mktsegment AS tagged,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           REGEXP_EXTRACT(c_name, '(\\d+)', 1) AS cust_num,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT')
             AS seg_or_default,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
      AND REGEXP_MATCHES(c_name, 'Customer#\\d+')
    """,
)
def q_scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substr/concat/length/regexp_extract/coalesce/when/rlike/isin
    — the reference's scalar battery (incremental_kafka_s3_cdc.py:91-93,
    295-297, 331; sanpshot_script.py:217-218, 252-259)."""
    c = T(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE")
            & F.col("c_name").rlike(r"Customer#\d+")
        )
        .select(
            "c_custkey",
            F.upper("c_mktsegment").alias("seg_upper"),
            F.substring("c_name", 1, 9).alias("name_prefix"),
            F.concat(
                F.col("c_name"), F.lit("#"), F.col("c_mktsegment")
            ).alias("tagged"),
            F.length("c_name").cast("int").alias("name_len"),
            F.regexp_extract("c_name", r"(\d+)", 1).alias("cust_num"),
            F.coalesce(
                F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                F.lit("DEFAULT"),
            ).alias("seg_or_default"),
            F.when(F.col("c_acctbal") < 0, "neg")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("high")
            .alias("bal_band"),
        )
    )


@query(
    "q_date_funcs",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'month_revenue')}
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction + date_trunc grouping (reference F8/F9
    date_format family)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "month_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# window functions (SURVEY.md §2.6)
# ---------------------------------------------------------------------------
@query(
    "q_top3_customers_per_nation",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, CAST(rn AS INT) AS rn
    FROM (SELECT c_custkey, c_nationkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer)
    WHERE rn <= 3
    """,
)
def q_top3_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the same window shape as the
    CDC keep-last dedup (reference :321-325 re-expressed, SURVEY W1)."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        T(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_order_gaps_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           CAST(DATE_DIFF('day',
                CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS DATE),
                CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
    FROM orders
    """,
)
def q_order_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic — days since the customer's previous order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
        .cast("int")
        .alias("days_since_prev"),
    )


@query(
    "q_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (prefix) sum per customer — exact decimal accumulation so
    every prefix is deterministic."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )
