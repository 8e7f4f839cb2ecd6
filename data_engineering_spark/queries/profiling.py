"""Data-profiling and inverted-index queries (oracle-checked)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.profile import profile
from data_engineering_spark.operators.text import tokens
from data_engineering_spark.registry import query


def _col_profile_sql(c: str, numeric: bool) -> str:
    mn = f"CAST(MIN({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
    mx = f"CAST(MAX({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
    return f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {mn} AS min_value, {mx} AS max_value
    FROM orders"""


_ORDERS_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


@query(
    "q_profile_orders",
    oracle="\nUNION ALL\n".join(
        _col_profile_sql(c, num) for c, num in _ORDERS_COLS
    ),
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile of orders: nulls / exact distinct /
    numeric min-max for every column, packed into a SINGLE scan +
    reduction (operators/profile.profile) — the oracle needs one
    full scan PER COLUMN. The profile row explodes to long form
    driver-free."""
    o = load_table(spark, sf_dir, "orders").select(
        *[c for c, _ in _ORDERS_COLS]
    )
    return profile(o)


@query(
    "q_doc_postings",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents),
    postings AS (
      SELECT w AS term,
             CAST(COUNT(*) AS BIGINT) AS tf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
             array_to_string(list_sort(list_distinct(list(doc_id))), ',')
               AS docs
      FROM tok GROUP BY 1)
    SELECT term, tf, df, docs FROM postings WHERE df >= 8
    """,
)
def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: term -> (term frequency, document
    frequency, sorted posting list), one explode + one aggregation.
    The posting list is emitted as a comma-joined string (the
    collections.py array convention — engine-neutral value hashing);
    df >= 8 bounds the output AFTER aggregation (no correctness
    shortcut). The search-index build step of a retrieval pipeline."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.count_distinct("doc_id").cast("bigint").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("docs"),
        )
        .filter(F.col("df") >= 8)
    )


@query(
    "q_lineitem_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag ORDER BY l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS tw
      FROM lineitem)
    SELECT l_returnflag,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS l_extendedprice_wq
    FROM w WHERE cw * 2.0 >= tw
    GROUP BY 1 ORDER BY 1
    """,
)
def q_lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag via
    `weighted_quantile` — each lineitem counts l_quantity times without
    materializing the exploded multiset. Deterministic despite
    duplicate prices: the crossing point of the cumulative weight is a
    property of the price's tie GROUP (intra-group order cannot move
    it), so MIN over the qualifying set is engine-invariant. Weights
    accumulate as BIGINT (exact); only the final q·total comparison
    touches a float, and 1/q = 2.0 is IEEE-exact.
    """
    from data_engineering_spark.operators.profile import weighted_quantile

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__w", F.col("l_quantity").cast("bigint")
    )
    return weighted_quantile(
        li, "l_extendedprice", "__w", ["l_returnflag"], q=0.5
    )
