"""Relational coverage, batch 3: TPC-H-shaped subquery/decorrelation
patterns adapted to the driver's schema (no commitdate/partsupp — date
arithmetic on shipdate and lineitem-as-partsupp stand in)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import dec, dsum, query, sql_dsum


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV = "l_extendedprice*(1-l_discount)"


@query(
    "q04_priority_with_late_items",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: EXISTS with a correlated non-equi predicate →
    left-semi join with a mixed equi+range condition."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    l = T(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q07_nation_trade_flows",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
           {sql_dsum(_REV, 'revenue', 6)}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: two roles of the same dimension (nation joined
    twice under different aliases) + disjunctive pair filter."""
    n = T(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | (
        (F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1")
    )
    return (
        l.join(T(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(T(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(T(spark, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .filter(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(dsum(rev, "revenue", 6))
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    WITH counts AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM counts GROUP BY c_count
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13: two-level aggregation (distribution of order counts),
    outer join preserving zero-order customers."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    counts = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: negated predicates + IN-list + distinct agg
    (lineitem stands in for partsupp)."""
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    l = T(spark, sf_dir, "lineitem")
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH avg_qty AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_q
      FROM lineitem GROUP BY l_partkey)
    SELECT {sql_dsum('l_extendedprice', 'total_price')},
           COUNT(*) AS n_small
    FROM lineitem JOIN part ON l_partkey = p_partkey
    JOIN avg_qty ON l_partkey = pk
    WHERE p_brand = 'Brand#2' AND l_quantity < 0.5 * avg_q
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape: correlated average-quantity subquery,
    decorrelated into a per-key aggregate + join."""
    l = T(spark, sf_dir, "lineitem")
    avg_q = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity"))
        .alias("avg_q")
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_q, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_q"))
        .agg(
            dsum("l_extendedprice", "total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "q19_disjunctive_filter",
    oracle=f"""
    SELECT {sql_dsum(_REV, 'revenue', 6)}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 15 AND l_quantity <= 35)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 25 AND l_quantity <= 45)
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19: three-way disjunction of conjunctive range predicates
    (a pushdown/CNF-conversion stress test)."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def arm(brand: str, s0: int, s1: int, q0: int, q1: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s0, s1)
            & (F.col("l_quantity") >= q0)
            & (F.col("l_quantity") <= q1)
        )

    cond = (
        arm("Brand#1", 1, 15, 1, 21)
        | arm("Brand#3", 10, 30, 15, 35)
        | arm("Brand#5", 20, 50, 25, 45)
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(rev, "revenue", 6))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey AS sk, {sql_dsum(_REV, 'total_rev', 6)}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN srev ON s_suppkey = sk
    WHERE total_rev = (SELECT MAX(total_rev) FROM srev)
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15: aggregate-of-aggregate (max over grouped revenue) via
    a broadcast scalar join — the view+subquery form decorrelated."""
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    srev = l.groupBy(F.col("l_suppkey").alias("sk")).agg(
        dsum(rev, "total_rev", 6)
    )
    mx = srev.agg(F.max("total_rev").alias("mx"))
    return (
        T(spark, sf_dir, "supplier")
        .join(srev, F.col("s_suppkey") == F.col("sk"))
        .join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev")
    )
