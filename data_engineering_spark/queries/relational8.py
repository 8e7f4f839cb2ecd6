"""Relational coverage, batch 8: second-tier scalar/analytic function
batteries — distribution window functions, extended string functions,
extended date functions (SURVEY.md §2.6/§2.8 widening).

Cross-engine notes baked into the oracles: DuckDB dayofweek is 0-based
(Sunday=0) vs Spark's 1-based; month addition clamps to month-end in
both engines; percent_rank/cume_dist are int/int-derived doubles and
bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import query


@query(
    "q_window_battery2",
    oracle="""
    SELECT c_custkey,
           percent_rank() OVER w AS bal_pct_rank,
           cume_dist() OVER w AS bal_cume,
           CAST(nth_value(c_custkey, 3) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS third_poorest,
           CAST(first_value(c_custkey) OVER w AS BIGINT) AS poorest,
           CAST(last_value(c_custkey) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS BIGINT) AS richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution/navigation window functions: percent_rank,
    cume_dist, nth_value, first_value, last_value with explicit frames
    (unbounded-following for a well-defined last_value). Total order
    via the c_custkey tiebreaker."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_cur = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return c.select(
        "c_custkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume"),
        F.nth_value("c_custkey", 3).over(w_cur)
        .cast("bigint")
        .alias("third_poorest"),
        F.first("c_custkey").over(w).cast("bigint").alias("poorest"),
        F.last("c_custkey").over(w_all).cast("bigint").alias("richest"),
    )


@query(
    "q_string_funcs2",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_padded,
           rpad(p_type, 10, '.') AS type_padded,
           translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
           CAST(levenshtein(p_brand, p_type) AS INT) AS brand_type_dist,
           split_part(p_name, ' ', 2) AS name_second_word,
           repeat(left(p_brand, 2), 2) AS brand_echo,
           reverse(p_type) AS type_reversed,
           right(p_name, 3) AS name_tail
    FROM part
    """,
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string battery: lpad/rpad, translate, levenshtein,
    split_part, repeat, left/right, reverse — each with an identical
    DuckDB twin."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.rpad("p_type", 10, ".").alias("type_padded"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels"),
        F.levenshtein("p_brand", "p_type")
        .cast("int")
        .alias("brand_type_dist"),
        F.split_part("p_name", F.lit(" "), F.lit(2)).alias(
            "name_second_word"
        ),
        F.repeat(F.left("p_brand", F.lit(2)), 2).alias("brand_echo"),
        F.reverse("p_type").alias("type_reversed"),
        F.right("p_name", F.lit(3)).alias("name_tail"),
    )


@query(
    "q_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           last_day(o_orderdate) AS month_end,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT)
             AS days_since_epoch_start,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
)
def q_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date battery: add_months (month-end clamping matches
    DuckDB's interval addition), last_day, quarter, dayofweek (Spark is
    1-based Sunday, DuckDB 0-based — oracle shifts), ISO week, datediff,
    quarter truncation."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).alias("plus3m"),
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("q_start"),
    )
