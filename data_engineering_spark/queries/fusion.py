"""Hybrid retrieval queries (operators/fusion.py).

Query-by-example over the aligned documents/embeddings tables (the
testdata generator keys both by the same 0..N-1 ids): for each of 4
fixed query documents, the LEXICAL leg ranks the corpus by integer
coordination-level matching against the query doc's distinct terms,
the VECTOR leg ranks by exact cosine against the query doc's
embedding (the repo's bit-stable cosine_topk), and reciprocal-rank
fusion merges the two top-20 lists. Every stage is either integer or
a fixed IEEE expression tree, so the DuckDB twin replays the ENTIRE
hybrid pipeline hash-exactly — including the fusion arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import query

_QIDS = (0, 1, 2, 3)  # query-by-example docs, present at every sf
_LEG_K = 20  # per-leg candidate depth
_FUSE_K = 10  # fused results per query
_RRF_K = 60  # the canonical RRF constant

_QID_SQL = f"({', '.join(str(q) for q in _QIDS)})"

_HYBRID_CTES = f"""
    tok AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS t
      FROM documents),
    tf AS (
      SELECT doc_id, w AS term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS w FROM tok) GROUP BY 1, 2),
    qterms AS (
      SELECT DISTINCT doc_id AS query_id, w AS term
      FROM (SELECT doc_id, unnest(t) AS w FROM tok)
      WHERE doc_id IN {_QID_SQL}),
    lex_scored AS (
      SELECT q.query_id, f.doc_id,
             COUNT(*) AS n_shared, SUM(f.tf) AS tf_shared
      FROM tf f JOIN qterms q ON f.term = q.term
      WHERE f.doc_id <> q.query_id
      GROUP BY 1, 2),
    lex AS (
      SELECT query_id, doc_id, CAST(rn AS INT) AS rank
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY n_shared DESC, tf_shared DESC, doc_id) AS rn
            FROM lex_scored)
      WHERE rn <= {_LEG_K}),
    ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
    vec_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
             list_cosine_similarity(q.v, c.v) AS cosine
      FROM ev q JOIN ev c ON c.vec_id <> q.vec_id
      WHERE q.vec_id IN {_QID_SQL}),
    vec AS (
      SELECT query_id, doc_id, CAST(rn AS INT) AS rank
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY cosine DESC, doc_id) AS rn
            FROM vec_scored)
      WHERE rn <= {_LEG_K}),
    fused AS (
      SELECT COALESCE(l.query_id, v.query_id) AS query_id,
             COALESCE(l.doc_id, v.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / ({_RRF_K} + l.rank), 0.0)
                   + COALESCE(1.0 / ({_RRF_K} + v.rank), 0.0),
                   9) AS rrf_r,
             l.rank AS lex_rank, v.rank AS vec_rank
      FROM lex l FULL OUTER JOIN vec v
        ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
"""


@query(
    "q_doc_hybrid_rrf",
    oracle=f"""
    WITH {_HYBRID_CTES}
    SELECT query_id, CAST(rn AS INT) AS fused_rank, doc_id, rrf_r,
           lex_rank, vec_rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY rrf_r DESC, doc_id) AS rn
          FROM fused)
    WHERE rn <= {_FUSE_K}
    """,
)
def q_doc_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval, fused with RRF (k=60): top-10
    per query over the union of the lexical top-20 (integer
    coordination ranking — shared distinct terms, then shared tf,
    then doc id) and the vector top-20 (exact cosine). The fused rank
    orders by the ROUNDED rrf score then doc id, so both engines rank
    identical keys. Fusion itself is metadata-sized (<= 40 candidate
    rows per query); the corpus-touching work is one tokenize/count
    pass and one broadcast-query cosine scan."""
    from data_engineering_spark.operators.fusion import (
        coordination_rank,
        rrf_fuse,
    )
    from data_engineering_spark.operators.similarity import cosine_topk
    from data_engineering_spark.operators.text import tokens

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")

    words = d.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    qterms = (
        words.filter(F.col("doc_id").isin(*_QIDS))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    lex = coordination_rank(tf, qterms, topk=_LEG_K)

    # vec_id unique + isin over len(_QIDS) literals => <= len(_QIDS)
    # rows; the limit is a no-op that makes the bound plan-visible for
    # the cartesian gate (same idiom as q_cosine_topk)
    qvecs = e.filter(F.col("vec_id").isin(*_QIDS)).limit(len(_QIDS))
    vec = cosine_topk(e, qvecs, k=_LEG_K).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )

    return rrf_fuse(
        lex.select("query_id", "doc_id", "rank"),
        vec,
        k_rrf=_RRF_K,
        topk=_FUSE_K,
        a_name="lex",
        b_name="vec",
    )
