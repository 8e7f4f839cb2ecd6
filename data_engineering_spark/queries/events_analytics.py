"""Product-analytics shapes over the event stream (oracle-checked):
ordered funnels, cohort retention, transition matrices.

These are the classic "sequence over user timeline" queries — every
one is a single shuffle on user_id followed by arithmetic; the funnel
deliberately chains its stage windows on the SAME partitioning so
Catalyst reuses one exchange instead of re-shuffling per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.functions.temporal import (
    timestamp_to_epoch_millis,
)
from data_engineering_spark.registry import query


@query(
    "q_events_funnel",
    oracle="""
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t1
      FROM events GROUP BY 1),
    s AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN f USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > f.t1
      GROUP BY 1),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s.t2
      GROUP BY 1)
    SELECT f.user_id,
           CAST(epoch_ms(t1) AS BIGINT) AS view_ms,
           CAST(epoch_ms(t2) AS BIGINT) AS click_ms,
           CAST(epoch_ms(t3) AS BIGINT) AS purchase_ms,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS reached
    FROM f LEFT JOIN s USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view->click->purchase funnel per user: each stage is the
    first qualifying event STRICTLY AFTER the previous stage's time.
    Spark plan: three chained min-over-window stages all partitioned by
    user_id (one exchange, reused), then a same-key groupBy — no joins,
    versus the oracle's three join+agg rounds. At 100 TB that is one
    shuffle of the event stream, total."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    ts, et = F.col("ts"), F.col("event_type")
    staged = (
        e.withColumn(
            "t1", F.min(F.when(et == "view", ts)).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when((et == "click") & (ts > F.col("t1")), ts)
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when((et == "purchase") & (ts > F.col("t2")), ts)
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t1").alias("t1"),
        F.min("t2").alias("t2"),
        F.min("t3").alias("t3"),
    )
    reached = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return per_user.select(
        "user_id",
        timestamp_to_epoch_millis("t1").alias("view_ms"),
        timestamp_to_epoch_millis("t2").alias("click_ms"),
        timestamp_to_epoch_millis("t3").alias("purchase_ms"),
        reached.cast("int").alias("reached"),
    )


@query(
    "q_events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cw
      FROM events GROUP BY 1),
    act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
    SELECT CAST(cw AS DATE) AS cohort_week,
           CAST(date_diff('day', cw, w) // 7 AS INT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM act JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week,
    counted in each later week they were active. Week truncation is
    Monday-start in both engines; offsets are exact multiples of 7
    days so the integer division is engine-independent."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    act = e.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    return (
        act.join(firsts, "user_id")
        .groupBy(
            F.col("cw").cast("date").alias("cohort_week"),
            (F.datediff("w", "cw") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


@query(
    "q_events_transitions",
    oracle="""
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT event_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS next_type
          FROM events)
    WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix of the per-user event sequence
    (the Markov-chain summary of user behavior): lead() over the
    (ts, event_id) total order, then a tiny count aggregation."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@query(
    "q_events_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT)
             AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT)
             AS max_k
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured columns via Spark 4's VARIANT type: `parse_json`
    once into an open-schema binary-encoded value, then typed
    `variant_get` extraction — the modern engine answer to schemaless
    payloads (shredded access without a fixed struct, unlike
    from_json). Integer aggregates keep it oracle-exact against
    DuckDB's JSON extraction.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.variant_get(F.parse_json("props"), "$.k", "int").alias(
                "k"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
