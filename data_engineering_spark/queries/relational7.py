"""Relational coverage, batch 7: remaining TPC-H query shapes the
testdata's columns can express — market share (q08), product-line
profit (q09, sans the absent partsupp cost term), two-way conditional
counts (q12 shape), dominant-supplier detection (q20 shape), and
never-ordered high-balance customers (q22 shape).

Shapes per SURVEY.md §2.5/§2.4 extension surface (the reference itself
has no analytics queries; these exercise the general engine the north
star demands). Determinism follows registry.py policy: revenue sums via
decimal(18,6) accumulation, shares/averages as one double divide,
conditional counts cast BIGINT on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import dec, dsum, query, sql_dsum

_REV = "l_extendedprice * (1 - l_discount)"


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q08_market_share",
    oracle="""
    WITH base AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS rev,
             s_nationkey
      FROM lineitem
      JOIN orders   ON l_orderkey  = o_orderkey
      JOIN part     ON l_partkey   = p_partkey
      JOIN supplier ON l_suppkey   = s_suppkey
      JOIN customer ON o_custkey   = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
    SELECT o_year,
           CAST(SUM(CASE WHEN s_nationkey = 5
                         THEN CAST(rev AS DECIMAL(18,6))
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q08 shape: 6-way join (both nation roles via the dimension
    chain), then a conditional-share aggregate per year. Constant-size
    dims (nation, region) are forced broadcast; SF-linear tables
    (part/supplier/customer) are left to AQE, which broadcasts them
    while they fit and shuffles at scale — forcing them would OOM the
    100x case. Share = decimal-exact numerator/denominator divided once
    as doubles."""
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    base = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            T(spark, sf_dir, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            T(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(T(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(T(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter((F.col("r_name") == "ASIA") & (F.col("p_type") == "ECONOMY"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        base.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev.alias("rev"),
            "s_nationkey",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("s_nationkey") == 5, dec("rev", 6))
                    .otherwise(zero)
                ).cast("double")
                / F.sum(dec("rev", 6)).cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "q09_product_line_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           {sql_dsum(_REV, 'profit', 6)}
    FROM lineitem
    JOIN supplier ON l_suppkey   = s_suppkey
    JOIN part     ON l_partkey   = p_partkey
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q09 shape: profit per supplier-nation per order-year for a
    product line selected by p_name substring. Documented deviation: the
    testdata has no partsupp table, so profit omits the
    `ps_supplycost * l_quantity` subtrahend (revenue-only profit).
    Part filter is pushed below the join; only the constant-size
    nation dim is forced broadcast (SF-linear tables go through AQE)."""
    l = T(spark, sf_dir, "lineitem")
    red_parts = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(
            red_parts, F.col("l_partkey") == F.col("p_partkey")
        )
        .join(
            T(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            T(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(T(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev.alias("rev"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("rev", "profit", 6))
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape: join + two complementary conditional counts per
    group. Deviation: the testdata lacks l_shipmode/l_commitdate/
    l_receiptdate, so 'late' is l_shipdate > o_orderdate + 90 days and
    the grouping key is l_linestatus."""
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


@query(
    "q20_dominant_suppliers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    tot AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT s_name, COUNT(*) AS n_dominant_parts
    FROM ps JOIN tot USING (l_partkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE qty > 0.15 * total_qty
    GROUP BY s_name
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: per-(part,supplier) aggregate compared against a
    per-part threshold aggregate of the same relation (deviation: no
    partsupp/availqty, so the threshold is a share of the part's total
    shipped quantity — 'this supplier ships well above fair share'; the
    0.15 cut is calibrated to be selective-but-nonempty on the ~13
    suppliers/part testdata). Both aggregates share the lineitem scan;
    the threshold join is per-part (small) and dims broadcast."""
    l = T(spark, sf_dir, "lineitem")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity", "qty")
    )
    tot = l.groupBy("l_partkey").agg(dsum("l_quantity", "total_qty"))
    return (
        ps.join(tot, "l_partkey")
        .filter(F.col("qty") > 0.15 * F.col("total_qty"))
        .join(
            T(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_dominant_parts"))
    )


@query(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH cutoff AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(c_acctbal) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           {sql_dsum('c_acctbal', 'totacctbal')}
    FROM customer, cutoff
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: scalar-subquery threshold (avg positive balance)
    + NOT EXISTS anti-join + group-agg. Deviations: no c_phone column,
    so the group key is c_nationkey instead of the phone country code;
    and every testdata customer has some order, so 'idle' means no order
    since 2000-01-01 (a filtered anti join — the filter is pushed below
    it). The scalar is a broadcast nested-loop of one row; the anti join
    shuffles on o_custkey."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    cutoff = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(dec("c_acctbal")).cast("double")
                / F.count("c_acctbal")
            ).alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
