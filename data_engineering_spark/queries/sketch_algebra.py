"""KMV sketch set-algebra: pairwise union / intersection / Jaccard
estimates from mergeable sketches (oracle-checked)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.sketches import kmv_pairwise, kmv_sketch
from data_engineering_spark.registry import query


@query(
    "q_events_kmv_set_algebra",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type AS s,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM events WHERE user_id IS NOT NULL),
    sk AS (
      SELECT s, hv FROM (
        SELECT s, hv, ROW_NUMBER() OVER (PARTITION BY s ORDER BY hv) AS rn
        FROM h)
      WHERE rn <= 64),
    pairs AS (
      SELECT a.s AS set_a, b.s AS set_b
      FROM (SELECT DISTINCT s FROM sk) a, (SELECT DISTINCT s FROM sk) b
      WHERE a.s < b.s),
    m AS (
      SELECT set_a, set_b, hv, MAX(in_a) AS in_a, MAX(in_b) AS in_b
      FROM (
        SELECT p.set_a, p.set_b, k.hv, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk k ON k.s = p.set_a
        UNION ALL
        SELECT p.set_a, p.set_b, k.hv, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN sk k ON k.s = p.set_b)
      GROUP BY 1, 2, 3),
    top AS (
      SELECT * FROM (
        SELECT m.*, ROW_NUMBER() OVER (
          PARTITION BY set_a, set_b ORDER BY hv) AS rn
        FROM m)
      WHERE rn <= 64),
    agg AS (
      SELECT set_a, set_b, COUNT(*) AS m, MAX(hv) AS hk,
             COUNT(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 END) AS inter
      FROM top GROUP BY 1, 2)
    SELECT set_a, set_b,
           CASE WHEN m < 64 THEN CAST(m AS DOUBLE)
                ELSE 63.0 * 1152921504606846976.0 / hk END AS union_est,
           inter / m AS jaccard_est,
           (inter / m) * (CASE WHEN m < 64 THEN CAST(m AS DOUBLE)
                ELSE 63.0 * 1152921504606846976.0 / hk END) AS intersect_est
    FROM agg
    """,
)
def q_kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap analysis without a distinct-pair join: per
    event type, a 64-hash KMV sketch of its user set (one scan, one
    shuffle of (type, hash) pairs); then EVERY pairwise union size,
    Jaccard and intersection size is estimated purely from the
    sketches (operators/sketches.kmv_pairwise). At 100 TB the n² pair
    analysis runs over 64-row summaries — the corpus is read once. The
    estimates are deterministic functions of the data, so the oracle
    reproduces them bit-exactly."""
    e = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(e, "event_type", "user_id", k=64)
    out = kmv_pairwise(sk, "event_type", k=64)
    return out


@query(
    "q_events_cooccurrence",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT COUNT(DISTINCT user_id) AS nu FROM events),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_users
      FROM ut a JOIN ut b ON a.user_id = b.user_id
       AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, CAST(n_users AS BIGINT) AS n_users,
           n_users / (SELECT nu FROM n) AS support
    FROM p
    """,
)
def q_events_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Itemset co-occurrence (the association-rule support primitive):
    for every unordered pair of event types, how many users did both,
    and the support fraction. The corpus reduces FIRST to distinct
    (user, type) pairs — at most n_users x n_types rows — before the
    self-join, so the pair blow-up is over the reduced set, keyed on
    user_id (no cross join, no skew beyond the per-user type fan-out,
    which is bounded by the type vocabulary)."""
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    nu = e.agg(F.count_distinct("user_id").alias("nu"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    p = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return p.join(F.broadcast(nu)).select(
        "type_a",
        "type_b",
        F.col("n_users").cast("long").alias("n_users"),
        (F.col("n_users") / F.col("nu")).alias("support"),
    )


@query(
    "q_orders_surrogate_keys",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS seq_id
    FROM orders
    """,
)
def q_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global 1..N sequence in (orderdate, orderkey) order WITHOUT the
    single-partition global window: range-repartition so each partition
    owns a contiguous slice, then per-partition row_number + broadcast
    cumulative offsets (operators/ids.assign_sequential_ids). The
    oracle is the naive global ROW_NUMBER — same numbers, but the
    Spark plan has no all-data-in-one-task stage."""
    from data_engineering_spark.operators.ids import assign_sequential_ids

    o = load_table(spark, sf_dir, "orders")
    out = assign_sequential_ids(
        o, ["o_orderdate", "o_orderkey"], num_partitions=8
    )
    return out.select("o_orderkey", "seq_id")


@query(
    "q_embedding_label_centroids",
    oracle="""
    WITH e AS (
      SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings),
    m AS (
      SELECT label, dim,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*)
               AS mu
      FROM e GROUP BY 1, 2)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS dims,
           ROUND(CAST(SUM(CAST(CASE WHEN dim <= 8 THEN mu ELSE 0 END
                       AS DECIMAL(28,15))) AS DOUBLE), 6) AS head_mass,
           ROUND(CAST(SUM(CAST(mu * mu AS DECIMAL(28,15))) AS DOUBLE), 6)
             AS sq_norm
    FROM m GROUP BY label
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-label mean embedding (class centroids), computed by
    posexplode + decimal-accumulated per-dimension sums — the
    oracle-checkable twin of the KMeans centroids (which are rows-only
    by iteration order). Checked via two deterministic functionals of
    the centroid vector (head-coordinate mass and squared norm, both
    summed over an explicit dim order then rounded at 1e-6 — the
    double->decimal(28,15) quantization of mu differs between engines
    at the last decimal and a 1e-9 rounding sat on that boundary at
    sf0.1; the oracle
    casts REAL through DOUBLE before the decimal quantization because
    DuckDB's direct REAL→DECIMAL rounds at float precision). Shuffle
    carries (label, dim, partial-sum) triples — n_labels x 64 groups
    regardless of corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("dim0", "v")
    ).select(
        "label", (F.col("dim0") + 1).alias("dim"), F.col("v").cast("double").alias("v")
    )
    m = ex.groupBy("label", "dim").agg(
        (
            F.sum(F.col("v").cast("decimal(28,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    return m.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("dims"),
        F.round(
            F.sum(
                F.when(F.col("dim") <= 8, F.col("mu"))
                .otherwise(0.0)
                .cast("decimal(28,15)")
            ).cast("double"),
            6,
        ).alias("head_mass"),
        F.round(
            F.sum(
                (F.col("mu") * F.col("mu")).cast("decimal(28,15)")
            ).cast("double"),
            6,
        ).alias("sq_norm"),
    )


@query(
    "q_events_kmv_rolling_wau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM events WHERE user_id IS NOT NULL),
    sk AS (
      SELECT d, hv FROM (
        SELECT d, hv, ROW_NUMBER() OVER (PARTITION BY d ORDER BY hv) AS rn
        FROM du)
      WHERE rn <= 256),
    days AS (SELECT DISTINCT d AS day FROM sk),
    merged AS (
      SELECT DISTINCT g.day, s.hv
      FROM days g JOIN sk s
        ON s.d <= g.day AND s.d > g.day - 7),
    top AS (
      SELECT day, hv FROM (
        SELECT day, hv, ROW_NUMBER() OVER (
          PARTITION BY day ORDER BY hv) AS rn
        FROM merged)
      WHERE rn <= 256)
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                ELSE 255.0 * 1152921504606846976.0 / MAX(hv) END
             AS est_distinct
    FROM top GROUP BY day
    """,
)
def q_kmv_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users from MERGED per-day KMV sketches
    (operators/sketches.kmv_rolling_distinct) — the incremental scale
    path behind q_events_dau_wau_mau's exact WAU: history is never
    rescanned, each day appends one k-row sketch and any horizon is a
    re-minimized union of sketches. The estimate is a deterministic
    md5 function of the data, so the oracle reproduces it bit-exactly
    (and q_events_dau_wau_mau's exact WAU bounds its error in
    pytest)."""
    from data_engineering_spark.operators.sketches import (
        kmv_rolling_distinct,
    )

    e = load_table(spark, sf_dir, "events")
    out = kmv_rolling_distinct(
        e,
        F.date_trunc("day", "ts").cast("date"),
        "user_id",
        window_days=7,
        k=256,
    )
    return out.select("day", "n_kept", "est_distinct")
