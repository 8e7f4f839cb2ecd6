"""Relational coverage, batch 6: the remaining distinct TPC-H shapes —
double-correlated existence (q21) and HAVING against a global scalar
aggregate (q11), adapted to the driver's schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import dec, dsum, query, sql_dsum


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q21_sole_late_shipper",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
    any_line AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM any_line l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape: the same relation correlated twice — EXISTS
    (another supplier participated in the order) AND NOT EXISTS (another
    supplier also shipped late) — as a semi join plus an anti join with
    inequality correlation."""
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    late = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    any_line = l.select("l_orderkey", "l_suppkey").distinct()

    l2 = any_line.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    base = late.join(
        l2,
        (F.col("l_orderkey") == F.col("ok2"))
        & (F.col("l_suppkey") != F.col("sk2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("ok3"))
        & (F.col("l_suppkey") != F.col("sk3")),
        "left_anti",
    )
    return (
        base.join(
            T(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "q11_important_part_values",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, {sql_dsum('l_extendedprice', 'part_value')}
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > (
        SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,2))) AS DOUBLE)
               * 0.001
        FROM pv)
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: per-group value filtered against a fraction of
    the GLOBAL total (scalar subquery over the same aggregate),
    decorrelated into a broadcast scalar join. Both levels of the sum
    are decimal-exact, the ×0.001 is one deterministic double multiply."""
    l = T(spark, sf_dir, "lineitem")
    pv = l.groupBy("l_partkey").agg(dsum("l_extendedprice", "part_value"))
    total = pv.agg(
        (F.sum(dec("part_value")).cast("double") * 0.001).alias("__cut")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__cut"))
        .select("l_partkey", "part_value")
    )
