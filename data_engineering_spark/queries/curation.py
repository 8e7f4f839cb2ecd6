"""The composed corpus-curation pipeline as oracle-checked queries.

`operators/curation.curate_corpus` chains exact dedup → Gopher quality
band → near-dup canonicalization → domain cap. Here BOTH its outputs
are driver-contract queries with full DuckDB twins:

- q_corpus_curated: the curated document set itself (ids + grouping
  columns) — the strongest check, every stage's semantics must agree
  end-to-end for the final membership to hash-match;
- q_corpus_curation_funnel: the per-stage survivor counts (the report
  a pipeline operator reads).

The oracle rebuilds the same funnel in SQL: window dedup on text, the
proven Gopher-band CTE, the exact-Jaccard pair + recursive-CTE
transitive closure over the QUALITY SURVIVORS (not the raw corpus —
stage order matters and is part of what is being checked), keep-best
canonicalization and the rank cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.curation import (
    curate_corpus,
    funnel_counts,
)
from data_engineering_spark.registry import query

# stage CTEs shared by both oracles: e = exact-dedup survivors,
# q = quality survivors, canon = near-dup canonicals, capped = final
_FUNNEL_CTE = """
    e AS (
      SELECT doc_id, text, source, lang, n_chars FROM (
        SELECT d.*, ROW_NUMBER() OVER (
          PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents d) WHERE rn = 1),
    tq AS (
      SELECT *, string_split_regex(trim(text), '\\s+') AS toks FROM e),
    q AS (
      SELECT doc_id, text, source, lang, n_chars FROM (
        SELECT *, len(toks) AS nt,
               CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS BIGINT) AS cs,
               len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
                 AS na
        FROM tq)
      WHERE nt BETWEEN 50 AND 100000
        AND cs / GREATEST(nt, 1) BETWEEN 3 AND 10
        AND na / GREATEST(nt, 1) >= 0.8),
    tok2 AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM q),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM tok2),
    inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n AS na, b.n AS nb, COUNT(*) AS common
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    dup AS (
      SELECT doc_a, doc_b FROM prs
      WHERE common * 1.0 / (na + nb - common) >= 0.6),
    ed AS (
      SELECT doc_a AS u, doc_b AS v FROM dup
      UNION SELECT doc_b, doc_a FROM dup),
    reach(u, v) AS (
      SELECT u, v FROM ed
      UNION
      SELECT r.u, e2.v FROM reach r JOIN ed e2 ON r.v = e2.u),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u),
    memb AS (
      SELECT q.doc_id, q.source, q.lang, q.n_chars,
             COALESCE(c.cluster_id, q.doc_id) AS cl
      FROM q LEFT JOIN comp c USING (doc_id)),
    canon AS (
      SELECT doc_id, source, lang, n_chars FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY cl ORDER BY n_chars DESC, doc_id) AS rn
        FROM memb) WHERE rn = 1),
    capped AS (
      SELECT doc_id, source, lang, n_chars FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY source, lang
          ORDER BY n_chars DESC, doc_id) AS rk
        FROM canon) WHERE rk <= 5)
"""


# the funnel split into reusable pieces: exact-dedup head, the Gopher
# quality stage, and the near-dup/cap tail — so the classifier-gated
# variant below swaps ONLY the quality stage and shares everything else
_E_CTE, _rest = _FUNNEL_CTE.split("    tq AS (", 1)
_Q_GOPHER, _TAIL_CTE = ("    tq AS (" + _rest).split("    tok2 AS (", 1)
_TAIL_CTE = "    tok2 AS (" + _TAIL_CTE


def _classifier_funnel_cte() -> str:
    from data_engineering_spark.queries.classifier import (
        classifier_score_cte,
    )

    return (
        _E_CTE
        + classifier_score_cte("e")
        + """,
    q AS (
      SELECT e.doc_id, e.text, e.source, e.lang, e.n_chars
      FROM e JOIN scored USING (doc_id) WHERE scored.logit > 0),
"""
        + _TAIL_CTE
    )


def _curate(spark: SparkSession, sf_dir: str):
    d = load_table(spark, sf_dir, "documents")
    return curate_corpus(d, score_col="n_chars")


@query(
    "q_corpus_curated",
    oracle=f"""
    WITH RECURSIVE {_FUNNEL_CTE}
    SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM capped
    """,
)
def q_corpus_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated corpus membership after the full funnel — the
    composed pipeline's final answer, hash-checked end-to-end against
    the SQL twin of every stage."""
    final, _ = _curate(spark, sf_dir)
    return final.select(
        "doc_id", "source", "lang", F.col("n_chars").cast("long")
    )


@query(
    "q_corpus_curated_star",
    oracle=f"""
    WITH RECURSIVE {_FUNNEL_CTE}
    SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM capped
    """,
)
def q_corpus_curated_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same curation funnel with the STAR near-dup backend
    (minhash_star_clusters) — the large-corpus scale path. Same oracle
    as q_corpus_curated: the two backends must agree wherever banding
    recall holds, so the full SQL twin checks both the funnel AND the
    backend equivalence end-to-end (SCALE.md weak-scaling section for
    why this variant exists: the whole funnel stays sub-linear where
    the pair-join funnel goes quadratic)."""
    d = load_table(spark, sf_dir, "documents")
    final, _ = curate_corpus(d, score_col="n_chars", near_dup="star")
    return final.select(
        "doc_id", "source", "lang", F.col("n_chars").cast("long")
    )


@query(
    "q_corpus_curated_classifier",
    oracle=f"""
    WITH RECURSIVE {_classifier_funnel_cte()}
    SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM capped
    """,
)
def q_corpus_curated_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The curation funnel with the TRAINED-MODEL quality gate: the
    Gopher heuristic band is swapped for linear classifier scoring
    (operators/classifier.py, md5-portable synthetic weights, keep =
    logit > 0) while exact dedup, near-dup canonicalization and the
    domain cap stay identical. The oracle rebuilds the whole composed
    pipeline — classifier inference INSIDE the funnel — so stage order
    (classifier sees exact-dedup survivors, not the raw corpus) is
    part of what hash-matching checks."""
    from data_engineering_spark.operators.classifier import (
        synthetic_weights,
    )
    from data_engineering_spark.queries.classifier import (
        _B,
        _BIAS,
        _SCALE,
        _SEED,
    )

    d = load_table(spark, sf_dir, "documents")
    w = synthetic_weights(spark, _B, seed=_SEED, scale=_SCALE)
    final, _ = curate_corpus(
        d,
        score_col="n_chars",
        quality_gate="classifier",
        classifier_weights=w,
        classifier_bias=_BIAS,
        classifier_buckets=_B,
    )
    return final.select(
        "doc_id", "source", "lang", F.col("n_chars").cast("long")
    )


@query(
    "q_corpus_curation_funnel",
    oracle=f"""
    WITH RECURSIVE {_FUNNEL_CTE}
    SELECT 0 AS seq, 'raw' AS stage,
           (SELECT COUNT(*) FROM documents) AS n_docs
    UNION ALL SELECT 1, 'exact_dedup', (SELECT COUNT(*) FROM e)
    UNION ALL SELECT 2, 'quality', (SELECT COUNT(*) FROM q)
    UNION ALL SELECT 3, 'near_dedup', (SELECT COUNT(*) FROM canon)
    UNION ALL SELECT 4, 'domain_cap', (SELECT COUNT(*) FROM capped)
    """,
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor counts of the curation funnel — the report a
    pipeline operator watches. One lazy union of count aggregates, so
    the whole report is a single action on the Spark side."""
    _, stages = _curate(spark, sf_dir)
    return funnel_counts(stages)
