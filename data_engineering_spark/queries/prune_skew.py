"""Scale-machinery queries with exact oracles: semi-join reduction and
salted (two-stage) aggregation.

Both operators change only the PLAN, never the result, so they can be
held to the same bit-exact DuckDB oracle as a plain join / plain
GROUP BY — the point of registering them here is to prove that the
scale path is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.prune import semi_join_reduce
from data_engineering_spark.operators.skew import salted_agg
from data_engineering_spark.registry import dec, query, sql_davg, sql_dsum


@query(
    "q_semi_reduced_revenue",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(month(o.o_orderdate) AS INT) AS order_month,
           {rev},
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'F'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """.format(
        rev=sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "urgent_revenue", 4)
    ),
)
def q_semi_reduced_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue of finished URGENT orders, with the lineitem side
    pruned by `semi_join_reduce` BEFORE the wide join.

    Plan shape (asserted in tests/test_plans.py): the selective orders
    filter produces a distinct-key broadcast; lineitem passes a
    BroadcastHashJoin LeftSemi, so the wide l_* columns are never
    shuffled for lineitems of non-urgent orders (~96% of the table at
    every SF). The final join then only sees pre-matched rows. Result
    is oracle-identical to the unreduced join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    li_pruned = semi_join_reduce(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), orders, "o_orderkey"
    )
    joined = li_pruned.join(orders, "o_orderkey")
    return (
        joined.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
            .cast("double")
            .alias("urgent_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_salted_user_stats",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {total},
           CAST(MAX(value) AS DOUBLE) AS max_value,
           {mean}
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """.format(
        total=sql_dsum("value", "total_value", 6),
        mean=sql_davg("value", "avg_value", 6),
    ),
)
def q_salted_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event statistics via `salted_agg` (two-stage skew-proof
    aggregation) — oracle-identical to a plain GROUP BY.

    Every aggregate is expressed as (partial, combine): count→sum,
    decimal-sum→sum, max→max; avg is derived from the exact decimal sum
    and count AFTER combination (avg itself is not algebraic over
    partials without carrying both). A hot user lands in 16 salt
    buckets, so the widest stage-1 task holds 1/16th of the hot key —
    the shape that survives a bot user with 10⁹ events.
    """
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["user_id"],
        {
            "n_events": (F.count(F.lit(1)), F.sum("n_events")),
            "__dec_sum": (F.sum(dec("value", 6)), F.sum("__dec_sum")),
            "max_value": (F.max("value"), F.max("max_value")),
            "__n_val": (F.count("value"), F.sum("__n_val")),
        },
        num_salts=16,
    )
    return (
        out.select(
            "user_id",
            "n_events",
            F.col("__dec_sum").cast("double").alias("total_value"),
            F.col("max_value").cast("double").alias("max_value"),
            (F.col("__dec_sum").cast("double") / F.col("__n_val")).alias(
                "avg_value"
            ),
        )
    )


@query(
    "q_events_hybrid_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {total},
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    ORDER BY 1
    """.format(total=sql_dsum("e.value", "total_value", 6)),
)
def q_events_hybrid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ customer through `hybrid_skew_join` — hot users (≥12
    events) take a broadcast path, the cold tail takes the shuffle
    join — then per-segment stats. Oracle-identical to a plain inner
    join + GROUP BY: the hot/cold bifurcation changes only the plan
    (the union is exhaustive and disjoint for ANY hot-key split, which
    is why sample-based hot detection is safe at scale).
    """
    from data_engineering_spark.operators.skew import hybrid_skew_join

    ev = load_table(spark, sf_dir, "events").withColumnRenamed(
        "user_id", "c_custkey"
    )
    cust = load_table(spark, sf_dir, "customer")
    joined = hybrid_skew_join(ev, cust, ["c_custkey"], hot_threshold=12)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 6)).cast("double").alias("total_value"),
            F.countDistinct("c_custkey").alias("n_users"),
        )
    )


@query(
    "q_join_size_estimate",
    oracle=f"""
    WITH lk AS (
      SELECT l_orderkey AS k FROM lineitem
      WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || 'js'),
                  1, 15))::BIGINT AS BIGINT) < {int(0.1 * (1 << 60))}),
    rk AS (
      SELECT o_orderkey AS k FROM orders
      WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || 'js'),
                  1, 15))::BIGINT AS BIGINT) < {int(0.1 * (1 << 60))})
    SELECT CAST(COUNT(*) AS BIGINT) AS sampled_pairs,
           CAST(COUNT(*) AS DOUBLE) / 0.1 AS estimated_pairs
    FROM lk JOIN rk ON lk.k = rk.k
    """,
)
def q_join_size_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by coordinated 10% key sampling:
    both sides keep keys under the SAME deterministic hash threshold,
    so the sampled join size scales by exactly 1/rate (not 1/rate²) —
    the number a planner wants before choosing a shuffle strategy for
    lineitem ⋈ orders. Deterministic, so oracle-exact."""
    from data_engineering_spark.operators.prune import join_size_estimate

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return join_size_estimate(li, o, "l_orderkey", "o_orderkey", rate=0.1)
