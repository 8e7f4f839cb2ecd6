"""Time-series operator queries: as-of join, interval (range) join,
multi-granularity rollup — over the `events` table.

Oracles: DuckDB has a native ASOF JOIN (tie rule `<=` matches Spark's
union-window formulation exactly); the interval join and rollup are
plain SQL. Timestamps are emitted as epoch-ms BIGINT or timestamp_ntz
per registry policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.timeseries import (
    asof_join,
    hypertable_rollup,
    interval_join,
)
from data_engineering_spark.registry import dsum, query, sql_dsum


@query(
    "q_events_asof_purchase_click",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    purch AS (
      SELECT user_id, event_id, ts
      FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id,
           CAST(epoch_ms(p.ts) AS BIGINT) AS ts_ms,
           c.click_id,
           CAST(epoch_ms(p.ts) - epoch_ms(c.ts) AS BIGINT) AS gap_ms
    FROM purch p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the user's most recent click at
    or before the purchase time (attribution / time-to-convert). The
    click side is pre-aggregated to one row per (user, ts) — the
    uniqueness DuckDB's ASOF also requires for determinism. Spark plan:
    one shuffle on user_id + one window pass (operators/timeseries)."""
    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join(
        purch, clicks, on=["user_id"], left_ts="ts", right_ts="ts"
    )
    return joined.select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "click_id",
        (F.unix_millis("ts") - F.unix_millis("ts_r")).alias("gap_ms"),
    )


@query(
    "q_events_interval_join_conversions",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'),
    purch AS (
      SELECT user_id, event_id, ts
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, COUNT(c.ts) AS n_recent_clicks
    FROM purch p LEFT JOIN clicks c
      ON p.user_id = c.user_id
      AND c.ts >= p.ts - INTERVAL 30 MINUTE
      AND c.ts < p.ts
    GROUP BY p.event_id
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: clicks in the 30 minutes before each
    purchase, counted per purchase. The equi-key (user_id) keeps the
    plan a hash join with a residual range filter — no nested-loop
    product (operators/timeseries.interval_join)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = interval_join(
        purch,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="c_ts",
        lower=F.expr("INTERVAL -30 MINUTES"),
        upper=F.expr("INTERVAL 0 SECONDS"),
        how="left",
    )
    return joined.groupBy("event_id").agg(
        F.count("c_ts").alias("n_recent_clicks")
    )


@query(
    "q_events_hypertable_rollup",
    oracle=f"""
    SELECT 'hour' AS grain,
           CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS bucket_start,
           event_type, COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'day', CAST(DATE_TRUNC('day', ts) AS TIMESTAMP),
           event_type, COUNT(*), {sql_dsum('value', 'sum_value')}
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'month', CAST(DATE_TRUNC('month', ts) AS TIMESTAMP),
           event_type, COUNT(*), {sql_dsum('value', 'sum_value')}
    FROM events GROUP BY 2, 3
    """,
)
def q_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate at hour/day/month grains —
    ONE scan and ONE shuffle for all three (generator fan-out + single
    group-by, operators/timeseries.hypertable_rollup), vs the oracle's
    3-scan UNION ALL formulation."""
    e = load_table(spark, sf_dir, "events")
    return hypertable_rollup(
        e,
        ts_col="ts",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        ],
        grains=("hour", "day", "month"),
    )


@query(
    "q_events_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           CAST(MIN(epoch_us(ts)) // 1000 AS BIGINT) AS start_ms,
           CAST((MAX(epoch_us(ts)) + 1800000000) // 1000 AS BIGINT)
             AS end_ms,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in gap-based session operator (F.session_window,
    30-min gap): session end = last event + gap, and an event exactly
    at the gap boundary MERGES into the running session (verified:
    merge condition is next_start <= current_end), so the oracle's
    new-session cut is strictly-greater. Gap arithmetic runs at full
    microsecond precision on both engines; bounds are emitted as
    epoch-ms bigints. Streaming runs this identical plan incrementally
    with a watermark."""
    e = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        e.groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start")).alias("start_ms"),
            F.unix_millis(F.col("session_window.end")).alias("end_ms"),
            "n_events",
        )
    )


@query(
    "q_orders_in_promo_windows",
    oracle="""
    WITH pts AS (
      SELECT o_orderkey AS point_key, o_orderdate AS pt
      FROM orders WHERE o_orderkey % 7 = 3),
    iv AS (
      SELECT o_orderkey AS window_key,
             o_orderdate AS w_start,
             o_orderdate + INTERVAL 3 DAY AS w_end
      FROM orders WHERE o_orderkey % 97 = 0)
    SELECT p.point_key, i.window_key,
           CAST(epoch_ms(p.pt) AS BIGINT) AS pt_ms,
           CAST(epoch_ms(i.w_start) AS BIGINT) AS w_start_ms
    FROM pts p JOIN iv i
      ON p.pt >= i.w_start AND p.pt < i.w_end
    ORDER BY point_key, window_key
    """,
)
def q_orders_in_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS range join: orders (points) matched to 3-day promo
    windows derived from other orders — no shared column, the case a
    bare range predicate would plan as a broadcast-nested-loop.
    Spark side uses binned_range_join (1-day bins, equi-join on bin +
    residual filter; plan-asserted loop-free); DuckDB plans the plain
    range predicate with its native IEJoin. Identical output."""
    from data_engineering_spark.operators.timeseries import binned_range_join

    o = load_table(spark, sf_dir, "orders")
    pts = o.filter(F.col("o_orderkey") % 7 == 3).select(
        F.col("o_orderkey").alias("point_key"),
        F.col("o_orderdate").alias("pt"),
    )
    iv = o.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("window_key"),
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("w_end"),
    )
    out = binned_range_join(pts, iv, "pt", "w_start", "w_end")
    return out.select(
        "point_key",
        "window_key",
        F.unix_millis(F.col("pt").cast("timestamp")).alias("pt_ms"),
        F.unix_millis(F.col("w_start").cast("timestamp")).alias("w_start_ms"),
    )
