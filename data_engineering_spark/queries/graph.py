"""Graph-analytics queries over the near-dup pair graph
(oracle-checked where deterministic).

The edge set is the exact n-gram-Jaccard pair list — the same
`_PAIRS_CTE` SQL the cluster query uses — so graph statistics are
cross-checked end-to-end: Spark computes pairs AND the statistic; the
oracle recomputes both from scratch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.graph import (
    degrees,
    pagerank,
    triangle_count,
)
from data_engineering_spark.operators.text import ngram_jaccard_pairs
from data_engineering_spark.queries.llm_filters import _PAIRS_CTE
from data_engineering_spark.registry import query


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.6)


@query(
    "q_doc_dup_graph_degrees",
    oracle=f"""
    WITH {_PAIRS_CTE},
    uniq AS (
      SELECT DISTINCT LEAST(doc_a, doc_b) AS u,
                      GREATEST(doc_a, doc_b) AS v
      FROM dup WHERE doc_a <> doc_b),
    ends AS (
      SELECT u AS vertex FROM uniq
      UNION ALL SELECT v FROM uniq),
    deg AS (
      SELECT vertex, CAST(COUNT(*) AS BIGINT) AS degree
      FROM ends GROUP BY 1)
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_vertices
    FROM deg GROUP BY 1
    """,
)
def q_dup_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-duplicate graph — the shape probe
    that tells a dedup pipeline whether it is looking at scattered
    pairs or a boilerplate hub before it commits to clustering."""
    deg = degrees(_pairs(spark, sf_dir))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vertices")
    )


@query(
    "q_doc_dup_triangles",
    oracle=f"""
    WITH {_PAIRS_CTE},
    ed AS (
      SELECT LEAST(doc_a, doc_b) AS u, GREATEST(doc_a, doc_b) AS v
      FROM dup WHERE doc_a <> doc_b)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM ed e1
    JOIN ed e2 ON e1.v = e2.u
    WHERE EXISTS (
      SELECT 1 FROM ed e3 WHERE e3.u = e1.u AND e3.v = e2.v)
    """,
)
def q_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the near-dup graph (oriented-wedge join,
    operators/graph.triangle_count): high triangle density means the
    pair threshold found genuine clusters, near-zero means noise. The
    orientation trick bounds wedge skew at scale."""
    return triangle_count(_pairs(spark, sf_dir))


def _pagerank_oracle(damping: float = 0.85, n_iter: int = 10) -> str:
    """DuckDB mirror of operators/graph.pagerank over the transition
    graph: the 10 fixed-point iterations UNROLLED as chained CTEs.
    Bit-exact because both engines quantize each contribution with the
    portable floor(x*1e12 + 0.5), accumulate in BIGINT, and do
    identical per-row IEEE double arithmetic in between (decimal casts
    of doubles are NOT portable at fine scales - see operators/graph)."""
    d = f"CAST({damping} AS DOUBLE)"
    parts = [f"""
    edges AS MATERIALIZED (
      SELECT event_type AS src, next_type AS dst,
             CAST(count(*) AS BIGINT) AS n
      FROM (SELECT event_type,
                   lead(event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events)
      WHERE next_type IS NOT NULL
      GROUP BY 1, 2),
    verts AS MATERIALIZED (
      SELECT src AS vertex FROM edges
      UNION SELECT dst FROM edges),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM verts),
    outf AS MATERIALIZED (
      SELECT src, dst,
             CAST(n AS DOUBLE) /
             CAST(SUM(CAST(CAST(n AS DOUBLE) AS DECIMAL(18,6)))
                    OVER (PARTITION BY src) AS DOUBLE) AS frac
      FROM edges),
    r0 AS MATERIALIZED (
      SELECT vertex, CAST(1.0 AS DOUBLE) / (SELECT nd FROM nn) AS rank
      FROM verts)"""]
    for i in range(1, n_iter + 1):
        parts.append(f""",
    c{i} AS MATERIALIZED (
      SELECT o.dst AS vertex,
             SUM(CAST(FLOOR(r.rank * o.frac * 1e12 + 0.5) AS BIGINT))
               AS ci
      FROM outf o JOIN r{i-1} r ON o.src = r.vertex
      GROUP BY o.dst),
    res{i} AS MATERIALIZED (
      SELECT (CAST(1.0 AS DOUBLE) - {d} *
              COALESCE(CAST(SUM(ci) AS DOUBLE) / 1e12,
                       CAST(0.0 AS DOUBLE)))
             / (SELECT nd FROM nn) AS res
      FROM c{i}),
    r{i} AS MATERIALIZED (
      SELECT v.vertex,
             {d} * COALESCE(CAST(c.ci AS DOUBLE) / 1e12,
                            CAST(0.0 AS DOUBLE))
               + (SELECT res FROM res{i}) AS rank
      FROM verts v LEFT JOIN c{i} c ON v.vertex = c.vertex)""")
    parts.append(f"""
    SELECT vertex AS event_type, CAST(rank AS DOUBLE) AS rank
    FROM r{n_iter} ORDER BY event_type""")
    return "WITH" + "".join(parts)


@query("q_events_pagerank", oracle=_pagerank_oracle())
def q_event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the event-type transition graph (edges =
    q_events_transitions counts): which event states dominate the
    user-behavior Markov chain. Decimal-accumulated fixed-point
    iteration makes the ranks bit-exact cross-engine, so the oracle is
    the REAL thing: 10 iterations unrolled as DuckDB CTEs, compared
    without rounding."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pr = pagerank(edges, "src", "dst", weight_col="n", n_iter=10)
    return pr.select(
        F.col("vertex").alias("event_type"),
        F.col("rank").cast("double").alias("rank"),
    )
