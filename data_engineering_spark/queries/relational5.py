"""Relational coverage, batch 5: explicit GROUPING SETS with grouping
markers (SQL-text path through spark.sql + temp views, exercising the
engine's SQL front door), min-per-group join-back decorrelation, and
windowed bigram statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table, register_views
from data_engineering_spark.operators.text import tokens
from data_engineering_spark.registry import dsum, query, sql_dsum


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS n, {sql_dsum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + GROUPING() null-vs-group markers, run
    through spark.sql over registered views — the SQL entry point the
    engine exposes alongside the DataFrame API."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q02_cheapest_supplier_per_part",
    oracle="""
    WITH offers AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey),
    best AS (SELECT pk, MIN(unit_price) AS best_price
             FROM offers GROUP BY pk)
    SELECT o.pk AS p_partkey, MIN(o.sk) AS best_suppkey, best_price
    FROM offers o JOIN best b ON o.pk = b.pk
      AND o.unit_price = b.best_price
    GROUP BY o.pk, best_price
    """,
)
def q02_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: min-per-group correlated subquery, decorrelated
    into aggregate + join-back on the min value (ties resolved by MIN
    supplier key so the result is a function of the data). Per-offer
    unit price is a deterministic IEEE division in both engines."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    offers = l.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_price"
        )
    )
    best = offers.groupBy("pk").agg(
        F.min("unit_price").alias("best_price")
    ).withColumnRenamed("pk", "bpk")
    return (
        offers.join(
            best,
            (F.col("pk") == F.col("bpk"))
            & (F.col("unit_price") == F.col("best_price")),
        )
        .groupBy(F.col("pk").alias("p_partkey"), F.col("best_price"))
        .agg(F.min("sk").alias("best_suppkey"))
        .select("p_partkey", "best_suppkey", "best_price")
    )


@query(
    "q_doc_top_bigrams_per_lang",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
      FROM documents),
    bg AS (
      SELECT lang,
             unnest(list_transform(range(1, greatest(len(t), 1)),
                                   i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM tok),
    counts AS (
      SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2),
    ranked AS (
      SELECT lang, bigram, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, bigram) AS rn
      FROM counts)
    SELECT lang, bigram, n, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 5
    """,
)
def q_doc_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language: generator → aggregate → ranking
    window over the aggregate (non-distinct bigrams, all occurrences
    counted)."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.posexplode(tokens("text")).alias("pos", "w")
    )
    nxt = F.lead("w", 1).over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    bg = (
        tok.select(
            "lang", F.concat_ws(" ", F.col("w"), nxt).alias("bigram"),
            nxt.alias("__n"),
        )
        .filter(F.col("__n").isNotNull())
        .select("lang", "bigram")
    )
    counts = bg.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    rnk = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counts.withColumn("rn", F.row_number().over(rnk).cast("int"))
        .filter(F.col("rn") <= 5)
    )
