"""Collection-type scalar function batteries: ArrayType and MapType
surfaces (SURVEY.md §1.2 notes the reference has neither; our engine
exposes the full Spark collection surface, oracle-checked here).

Array/map columns themselves never reach the result frame (the
driver's canonicalizer cannot hash list cells) — every battery reduces
collections to scalars: sizes, lookups, joined strings, aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import query


@query(
    "q_array_funcs",
    oracle="""
    WITH a AS (
      SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
      FROM lineitem GROUP BY l_orderkey)
    SELECT l_orderkey,
           CAST(len(qs) AS INT) AS n_items,
           qs[1] AS q_min,
           qs[-1] AS q_max,
           array_to_string(qs[1:3], ',') AS low3,
           CAST(len(list_distinct(qs)) AS INT) AS n_distinct,
           CAST(coalesce(list_position(qs, 25.0), 0) AS INT) AS pos_25,
           CAST(list_contains(qs, 50.0) AS INT) AS has_50,
           array_to_string(list_reverse(qs), ',') AS desc_str
    FROM a
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType battery over per-order quantity arrays: sort_array,
    size, element_at (head/tail), slice + array_join, array_distinct,
    array_position, array_contains, reverse. The collect_list is made
    deterministic by sort_array; quantities are small integral doubles
    so string renderings agree across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    a = l.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_quantity")).alias("qs")
    )
    fmt = lambda c: F.array_join(  # noqa: E731
        F.transform(c, lambda x: x.cast("decimal(12,1)").cast("string")),
        ",",
    )
    return a.select(
        "l_orderkey",
        F.size("qs").alias("n_items"),
        F.element_at("qs", 1).alias("q_min"),
        F.element_at("qs", -1).alias("q_max"),
        fmt(F.slice("qs", 1, 3)).alias("low3"),
        F.size(F.array_distinct("qs")).cast("int").alias("n_distinct"),
        F.array_position("qs", 25.0).cast("int").alias("pos_25"),
        F.array_contains("qs", 50.0).cast("int").alias("has_50"),
        fmt(F.reverse("qs")).alias("desc_str"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           json_extract_string(props, '$.k') AS k_value
    FROM events
    WHERE event_id % 100 = 0
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType battery: parse the JSON props column into
    map<string,string> (from_json), then map_keys + array_sort +
    array_join, size, and key lookup — reduced to scalar columns."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return e.filter(F.col("event_id") % 100 == 0).select(
        F.col("event_id"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "k").alias("k_value"),
    )


@query(
    "q_array_setops",
    oracle="""
    WITH a AS (
      SELECT l_orderkey,
             list_distinct(list_sort(list(CAST(l_quantity AS INTEGER))))
               AS qs
      FROM lineitem GROUP BY l_orderkey),
    p AS (SELECT [10, 25, 50] AS probe)
    SELECT l_orderkey,
           CAST(len(list_intersect(qs, probe)) AS INT) AS n_common,
           CAST(len(list_filter(qs, x -> NOT list_contains(probe, x)))
                AS INT) AS n_only_order,
           CAST(len(list_intersect(qs, probe)) > 0 AS INT) AS overlaps,
           CAST(len(list_distinct(list_concat(qs, probe))) AS INT)
             AS n_union,
           CAST(len(list_filter(qs, x -> x > 40)) > 0 AS INT) AS any_gt40,
           CAST(len(list_filter(qs, x -> NOT (x <= 50))) = 0 AS INT)
             AS all_le50,
           CAST(list_sum(qs) AS BIGINT) AS sum_distinct_q
    FROM a, p
    """,
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-algebra + higher-order battery: array_intersect /
    array_except / arrays_overlap / array_union against a probe set,
    exists / forall predicates, and an aggregate fold — per-order
    distinct quantity sets. All JVM lambda expressions inside the
    scan+agg stages; the oracle rebuilds each with DuckDB list
    functions (array_except's distinct semantics mirrored via
    list_filter over list_distinct inputs)."""
    l = load_table(spark, sf_dir, "lineitem")
    a = l.groupBy("l_orderkey").agg(
        F.array_distinct(
            F.sort_array(F.collect_list(F.col("l_quantity").cast("int")))
        ).alias("qs")
    )
    probe = F.array(F.lit(10), F.lit(25), F.lit(50))
    return a.select(
        "l_orderkey",
        F.size(F.array_intersect("qs", probe)).alias("n_common"),
        F.size(F.array_except("qs", probe)).alias("n_only_order"),
        F.arrays_overlap("qs", probe).cast("int").alias("overlaps"),
        F.size(F.array_union("qs", probe)).alias("n_union"),
        F.exists("qs", lambda x: x > 40).cast("int").alias("any_gt40"),
        F.forall("qs", lambda x: x <= 50).cast("int").alias("all_le50"),
        F.aggregate(
            "qs", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_distinct_q"),
    )
