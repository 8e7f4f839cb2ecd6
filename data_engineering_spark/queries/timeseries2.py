"""Linear-interpolation resampling, 2-D histograms, winsorized stats,
BPE merge-pair counting (oracle-checked)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.text import tokens
from data_engineering_spark.registry import query


@query(
    "q_events_resample_interp",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('day', min(ts)) AS mn,
             date_trunc('day', max(ts)) AS mx
      FROM events GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY))
               AS day
      FROM bounds),
    daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, value
      FROM (SELECT *, row_number() OVER (
              PARTITION BY user_id, date_trunc('day', ts)
              ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1),
    j AS (
      SELECT g.user_id, g.day, d.value,
             last_value(d.value IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN d.value IS NOT NULL THEN g.day END
                        IGNORE NULLS) OVER w_prev AS pd,
             first_value(d.value IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN d.value IS NOT NULL THEN g.day END
                         IGNORE NULLS) OVER w_next AS nd
      FROM grid g LEFT JOIN daily d
        ON g.user_id = d.user_id AND g.day = d.day
      WINDOW w_prev AS (PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, CAST(day AS DATE) AS day,
           CASE
             WHEN pv IS NOT NULL AND nv IS NOT NULL AND pd <> nd THEN
               pv + ((nv - pv) * date_diff('day', pd, day))
                    / date_diff('day', pd, nd)
             WHEN pv IS NOT NULL THEN pv
             ELSE nv
           END AS value_li
    FROM j
    """,
)
def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling by LINEAR INTERPOLATION on a per-user daily grid:
    each missing day gets pv + (nv-pv) * (day-pd)/(nd-pv_day) between
    its nearest observed neighbors (edges fall back to nearest value).
    Two frame windows over one partitioning — Spark plans both over a
    single exchange on user_id. The arithmetic tree is written
    identically in both engines (mul before div, int day deltas) so the
    IEEE-754 results match bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("mn"),
        F.date_trunc("day", F.max("ts")).alias("mx"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    wlast = Window.partitionBy(
        "user_id", F.date_trunc("day", "ts")
    ).orderBy(F.desc("ts"), F.desc("event_id"))
    daily = (
        e.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", F.date_trunc("day", "ts").alias("day"), "value"
        )
    )
    base = Window.partitionBy("user_id").orderBy("day")
    w_prev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_day = F.when(F.col("value").isNotNull(), F.col("day"))
    j = (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("value", ignorenulls=True).over(w_prev).alias("pv"),
            F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
            F.first("value", ignorenulls=True).over(w_next).alias("nv"),
            F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
        )
    )
    dd = lambda a, b: F.datediff(F.col(b), F.col(a)).cast("double")  # noqa: E731
    interp = (
        F.when(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("pd") != F.col("nd")),
            F.col("pv")
            + ((F.col("nv") - F.col("pv")) * dd("pd", "day"))
            / dd("pd", "nd"),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return j.select(
        "user_id",
        F.col("day").cast("date").alias("day"),
        interp.alias("value_li"),
    )


@query(
    "q_events_hist2d",
    oracle="""
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS value_bin,
           CAST(hour(ts) AS BIGINT) AS hour_bin,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    WHERE value IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_hist2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D density histogram (value bucket x hour-of-day) — the heatmap
    primitive for drift dashboards. Binning is a scan-stage projection
    (floor of one division, no UDF); the aggregate shuffles only
    (bin, bin, partial-count) triples, ~500 groups regardless of data
    size. hour() is UTC-pinned by registry.tune so both engines read
    the same wall clock."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            F.floor(F.col("value") / 25.0).alias("value_bin"),
            F.hour("ts").cast("long").alias("hour_bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_events_winsorized_stats",
    oracle="""
    WITH fences AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY 1)
    SELECT e.event_type,
           ROUND(CAST(SUM(CAST(
             LEAST(GREATEST(e.value, f.lo), f.hi) AS DECIMAL(18,6)))
             AS DOUBLE) / COUNT(e.value), 6) AS wins_mean,
           ROUND(f.lo, 6) AS lo_fence,
           ROUND(f.hi, 6) AS hi_fence,
           CAST(COUNT(CASE WHEN e.value < f.lo OR e.value > f.hi
                      THEN 1 END) AS BIGINT) AS n_clipped
    FROM events e JOIN fences f USING (event_type)
    GROUP BY e.event_type, f.lo, f.hi
    """,
)
def q_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group statistics: clip values to the exact
    [p5, p95] fences, then a decimal-accumulated mean plus the clipped
    count — robust location without dropping rows (vs the MAD filter
    which removes them). One grouped percentile pass (metadata-sized,
    broadcast back) + one clipped aggregation."""
    e = load_table(spark, sf_dir, "events")
    fences = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.round(
                F.sum(clipped.cast("decimal(18,6)")).cast("double")
                / F.count("value"),
                6,
            ).alias("wins_mean"),
            F.count(
                F.when(
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi")),
                    1,
                )
            ).alias("n_clipped"),
        )
        .select(
            "event_type",
            "wins_mean",
            F.round("lo", 6).alias("lo_fence"),
            F.round("hi", 6).alias("hi_fence"),
            "n_clipped",
        )
    )


@query(
    "q_doc_bpe_merge_pairs",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents WHERE lang = 'en'),
    pairs AS (
      SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
      FROM words, unnest(generate_series(1, len(w) - 1)) AS g(i)
      WHERE len(w) >= 2)
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs
    WHERE regexp_matches(pair, '^[a-z]{2}$')
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
)
def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE-training inner loop: count adjacent symbol pairs across
    the corpus and rank merge candidates (here the character-bigram
    base case, letters only). Pair extraction is a JVM lambda
    (transform over an index sequence — no Python, no self-join); the
    shuffle carries only 2-char keys with map-side partial counts, and
    the top-20 is totally ordered by (count, pair)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    words = d.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("w")
    ).where(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair")
    ).where(F.col("pair").rlike("^[a-z]{2}$"))
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


@query(
    "q_events_rank_normalize",
    oracle="""
    SELECT event_id, event_type,
           ROUND(percent_rank() OVER w, 9) AS pct_rank,
           ROUND(cume_dist() OVER w, 9) AS cdf,
           ntile(100) OVER w AS centile
    FROM events
    WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def q_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based normalization (the quantile-transform feature prep):
    percent_rank, empirical CDF (cume_dist) and centile bucket of each
    value within its event type, totally ordered by (value, event_id)
    so both engines agree on ties. One shuffle on event_type; the
    round-at-1e-9 absorbs last-ulp division differences in the
    (rank-1)/(n-1) arithmetic."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.where(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cdf"),
        F.ntile(100).over(w).alias("centile"),
    )
