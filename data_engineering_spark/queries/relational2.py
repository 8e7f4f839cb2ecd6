"""Relational coverage, batch 2: grouping extensions, every remaining
join type, window-function battery, math/null scalar batteries, manual
pivot, union-by-name (SURVEY.md §2.4-2.8 completeness)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import dec, dsum, query, sql_dsum


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q_cube_order_stats",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {sql_dsum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 4 subtotal combinations."""
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "revenue"))
    )


@query(
    "q_union_by_name",
    oracle="""
    SELECT custkey, acct_or_price, src FROM (
      SELECT c_custkey AS custkey, c_acctbal AS acct_or_price,
             'customer' AS src
      FROM customer WHERE c_acctbal > 9000
      UNION ALL BY NAME
      SELECT 'order' AS src, o_totalprice AS acct_or_price,
             o_custkey AS custkey
      FROM orders WHERE o_totalprice > 450000
    )
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: position-independent union — the schema-alignment
    semantic the reference implements by hand via NULL back-fill
    (SURVEY §2.7)."""
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acct_or_price"),
            F.lit("customer").alias("src"),
        )
    )
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(
            F.lit("order").alias("src"),
            F.col("o_totalprice").alias("acct_or_price"),
            F.col("o_custkey").alias("custkey"),
        )
    )
    return c.unionByName(o).select("custkey", "acct_or_price", "src")


@query(
    "q_window_battery",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           FIRST_VALUE(c_custkey) OVER w AS richest_cust,
           LAST_VALUE(c_custkey) OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS poorest_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / ntile / first_value / last_value with explicit
    frames and total orders."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.first("c_custkey").over(w).alias("richest_cust"),
        F.last("c_custkey").over(w_full).alias("poorest_cust"),
    )


@query(
    "q_moving_average_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             AS moving_avg
    FROM orders
    """,
)
def q_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (3 preceding) moving average, decimal-exact."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(dec("o_totalprice")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


@query(
    "q_full_outer_nation_profile",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (nations may lack suppliers or
    customers at small scale — both null sides exercised)."""
    c = (
        T(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        T(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    joined = c.alias("c").join(
        s.alias("s"), F.col("c.nk") == F.col("s.nk"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("c.nk"), F.col("s.nk")).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "q_right_join_suppliers",
    oracle="""
    SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_supp
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    """,
)
def q_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT outer join preserving supplier-less nations."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_supp"))
    )


@query(
    "q_cross_join_matrix",
    oracle="""
    SELECT r_name, s.o_orderstatus, COUNT(*) AS n_cells
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY 1, 2
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS join (small × small)."""
    r = T(spark, sf_dir, "region").select("r_name")
    s = T(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).groupBy("r_name", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_cells")
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_d,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_p,
           CAST(CEIL(l_quantity) AS BIGINT) AS ceil_q,
           CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS round_p,
           SQRT(l_extendedprice) AS sqrt_p,
           ROUND(LN(l_extendedprice), 6) AS ln_p,
           CAST(SIGN(l_discount - 0.05) AS INT) AS sign_d,
           GREATEST(l_quantity, l_discount * 100) AS g,
           LEAST(l_tax, l_discount) AS l,
           CAST(l_quantity AS BIGINT) % 7 AS mod7
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar battery (IEEE-deterministic set: sqrt is correctly
    rounded; ln wrapped in round(6); no exp/pow whose last-ulp behavior
    differs across libm implementations)."""
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.floor("l_extendedprice").cast("bigint").alias("floor_p"),
        F.ceil("l_quantity").cast("bigint").alias("ceil_q"),
        # round-to-integer of 2-decimal money is cross-engine safe (the
        # only boundary, .50, is exactly representable); rounding computed
        # doubles at sub-cent precision is NOT — Spark rounds the exact
        # binary expansion, DuckDB the shortest decimal repr, and every
        # third-decimal-=5 value diverges
        F.round("l_extendedprice", 0).cast("bigint").alias("round_p"),
        F.sqrt("l_extendedprice").alias("sqrt_p"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sign_d"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("l"),
        (F.col("l_quantity").cast("bigint") % 7).alias("mod7"),
    )


@query(
    "q_null_handling",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled,
           CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL
                THEN 1 ELSE 0 END AS was_null,
           IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'LOW') AS prio
    FROM orders WHERE o_orderkey < 500
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif/coalesce/ifnull/is-null battery — the NULL semantics the
    CDC back-fill path relies on."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("OPEN")).alias("status_filled"),
        F.when(status_or_null.isNull(), 1).otherwise(0).alias("was_null"),
        F.ifnull(
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")), F.lit("LOW")
        ).alias("prio"),
    )


@query(
    "q_pivot_year_status",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END",
                     'filled_revenue')}
    FROM orders GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via conditional aggregation (the portable form of
    PIVOT — identical shape in any engine)."""
    o = T(spark, sf_dir, "orders")
    n_for = lambda s: F.count(
        F.when(F.col("o_orderstatus") == s, F.lit(1))
    )
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr")
    ).agg(
        n_for("O").alias("n_open"),
        n_for("F").alias("n_filled"),
        n_for("P").alias("n_partial"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", dec("o_totalprice"))
        ).cast("double").alias("filled_revenue"),
    )


@query(
    "q_array_agg_top_customers",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_custkey,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer)
    SELECT c_nationkey,
           array_to_string(list(c_custkey ORDER BY rn), ',') AS top3_csv
    FROM ranked WHERE rn <= 3
    GROUP BY c_nationkey
    """,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation (collect_list under a total order),
    emitted as CSV so the comparison is type-plain."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    ranked = (
        T(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
    return ranked.groupBy("c_nationkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "c_custkey"))
                ),
                lambda s: s["c_custkey"].cast("string"),
            ),
            ",",
        ).alias("top3_csv")
    )


@query(
    "q_string_like_patterns",
    oracle="""
    SELECT p_brand,
           COUNT(*) FILTER (WHERE p_type LIKE 'PRO%') AS n_promo,
           COUNT(*) FILTER (WHERE p_name LIKE '%_5%') AS n_name5,
           COUNT(*) FILTER (WHERE p_type ILIKE 'sta%') AS n_standard,
           COUNT(*) FILTER (WHERE starts_with(p_type, 'ECO')) AS n_econ
    FROM part GROUP BY p_brand
    """,
)
def q_string_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / ILIKE / startswith predicate battery."""
    p = T(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.when(F.col("p_type").like("PRO%"), 1)).alias("n_promo"),
        F.count(F.when(F.col("p_name").like("%_5%"), 1)).alias("n_name5"),
        F.count(F.when(F.col("p_type").ilike("sta%"), 1)).alias(
            "n_standard"
        ),
        F.count(
            F.when(F.col("p_type").startswith("ECO"), 1)
        ).alias("n_econ"),
    )
