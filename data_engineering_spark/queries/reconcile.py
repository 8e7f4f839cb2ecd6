"""Reconciliation / incremental-maintenance queries (oracle-checked).

Drift is synthesized deterministically from the orders table in BOTH
engines (drop every 97th key, perturb every 89th price, append every
83rd key shifted past the key range) so the reconcile output is exactly
known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.reconcile import (
    merge_agg_state,
    reconcile,
)
from data_engineering_spark.registry import query


@query(
    "q_reconcile_drift",
    oracle="""
    WITH expected AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
    actual AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 89 = 0
                  THEN o_totalprice + 1 ELSE o_totalprice END
               AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 83 = 0),
    j AS (
      SELECT COALESCE(e.o_orderkey, a.o_orderkey) AS o_orderkey,
             CASE WHEN a.o_orderkey IS NULL THEN 'missing'
                  WHEN e.o_orderkey IS NULL THEN 'extra'
                  WHEN e.o_custkey IS DISTINCT FROM a.o_custkey
                    OR e.o_totalprice IS DISTINCT FROM a.o_totalprice
                  THEN 'mismatch' END AS status
      FROM expected e FULL OUTER JOIN actual a
        ON e.o_orderkey = a.o_orderkey)
    SELECT o_orderkey, status FROM j WHERE status IS NOT NULL
    """,
)
def q_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-vs-lake anti-entropy: NULL-safe full-outer comparison
    emitting ONLY divergent keys (missing / extra / mismatch) against a
    deterministically drifted copy of orders."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    actual = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 83 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 100000000
            )
        )
    )
    return reconcile(o, actual, ["o_orderkey"])


@query(
    "q_incremental_agg_merge",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_spend
    FROM orders GROUP BY 1
    """,
)
def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: per-customer
    order stats computed as state (2/3 of orders) merged with a delta
    (the rest) WITHOUT rescanning state's inputs — the oracle is the
    full recompute, proving the merge algebra exact. Sums accumulate in
    decimal so the merged doubles are bit-identical to the one-pass
    aggregate."""
    o = load_table(spark, sf_dir, "orders")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "__spend_dec"
            ),
        )

    state = agg(o.filter(F.col("o_orderkey") % 3 != 0))
    delta = agg(o.filter(F.col("o_orderkey") % 3 == 0))
    merged = merge_agg_state(
        state, delta, ["o_custkey"], ["n_orders", "__spend_dec"]
    )
    return merged.select(
        "o_custkey",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("__spend_dec").cast("double").alias("total_spend"),
    )


@query(
    "q_orders_change_feed",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate
      FROM orders WHERE o_orderkey % 7 <> 3),
    new AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders WHERE o_orderkey % 11 <> 4),
    feed AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN n.o_orderkey IS NULL THEN o.o_custkey
                  ELSE n.o_custkey END AS o_custkey,
             CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice
                  ELSE n.o_totalprice END AS o_totalprice,
             CASE WHEN n.o_orderkey IS NULL THEN o.o_orderdate
                  ELSE n.o_orderdate END AS o_orderdate,
             CASE WHEN o.o_orderkey IS NULL THEN 'c'
                  WHEN n.o_orderkey IS NULL THEN 'd'
                  WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
                    OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    OR o.o_orderdate IS DISTINCT FROM n.o_orderdate
                  THEN 'u' END AS __op
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, __op
    FROM feed WHERE __op IS NOT NULL
    ORDER BY o_orderkey
    """,
)
def q_orders_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed GENERATION (`table_changes`): diff two synthetic
    versions of `orders` (old: keys %7==3 absent, %5==0 prices doubled;
    new: keys %11==4 absent) into Debezium-coded c/u/d events — the
    inverse of the CDC apply path, equivalent to Delta's change data
    feed. Unchanged keys emit nothing. Oracle = the same diff as an
    explicit FULL OUTER JOIN in SQL.
    """
    from data_engineering_spark.operators.reconcile import table_changes

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    old = o.filter(F.col("o_orderkey") % 7 != 3).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    new = o.filter(F.col("o_orderkey") % 11 != 4)
    return table_changes(old, new, ["o_orderkey"])
