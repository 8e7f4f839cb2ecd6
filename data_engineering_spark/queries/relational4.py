"""Relational coverage, batch 4: statistical aggregates.

Cross-engine caution applies doubly here: percentile interpolation and
variance accumulation differ in last-ulp behavior between engines, so
outputs are rounded at granularities their ~1e-12 discrepancies cannot
cross (see registry docstring for the full policy)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import query


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q_percentiles_by_status",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(MIN(o_totalprice), 4) AS lo,
           ROUND(MAX(o_totalprice), 4) AS hi
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation on the sorted
    values; rounded at 1e-4 against last-ulp interpolation drift)."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )


@query(
    "q_correlation_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(stddev_samp(l_discount), 6) AS disc_stddev,
           ROUND(var_samp(l_tax), 6) AS tax_var,
           ROUND(covar_samp(l_quantity, l_discount), 6) AS qty_disc_cov
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / stddev / variance / covariance per group (both engines use
    numerically-stable one-pass accumulators; rounded at 1e-6 >> their
    ~1e-12 disagreement)."""
    l = T(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("disc_stddev"),
        F.round(F.var_samp("l_tax"), 6).alias("tax_var"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
            "qty_disc_cov"
        ),
    )


@query(
    "q_argmax_customer_per_nation",
    oracle="""
    SELECT c_nationkey,
           arg_max(c_custkey, c_acctbal * 100000000 + c_custkey)
             AS richest_custkey,
           arg_min(c_custkey, c_acctbal * 100000000 + c_custkey)
             AS poorest_custkey
    FROM customer GROUP BY c_nationkey
    """,
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (arg-max aggregation). The ordering value embeds
    the unique key as a tiebreaker — acctbal has 2 decimals so
    acctbal·1e8 + custkey stays an exact double (< 2^53): ties are
    impossible and both engines pick the same row."""
    c = T(spark, sf_dir, "customer")
    order_val = F.col("c_acctbal") * 100000000 + F.col("c_custkey")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_custkey", order_val).alias("richest_custkey"),
        F.min_by("c_custkey", order_val).alias("poorest_custkey"),
    )


@query(
    "q_conditional_distinct",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           COUNT(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
                               THEN o_custkey END) AS urgent_customers,
           COUNT(DISTINCT CASE WHEN o_totalprice > 300000
                               THEN o_custkey END) AS whale_customers
    FROM orders GROUP BY 1
    """,
)
def q_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT CASE ...) — distinct aggregation over a filtered
    domain (two distinct domains in one pass)."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr")
    ).agg(
        F.countDistinct(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_custkey"))
        ).alias("urgent_customers"),
        F.countDistinct(
            F.when(F.col("o_totalprice") > 300000, F.col("o_custkey"))
        ).alias("whale_customers"),
    )
