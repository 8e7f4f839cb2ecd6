"""Reciprocal-rank fusion (RRF) — hybrid retrieval over ranked lists
(Cormack, Clarke & Buettcher 2009; the fusion rule behind most
production hybrid lexical+vector search).

RRF combines per-query rankings from heterogeneous scorers WITHOUT
comparing their raw scores (BM25 points and cosine values are not on
one scale): each list contributes 1/(k + rank) for the documents it
ranked, and missing documents contribute nothing. Because the inputs
are integer ranks, the fused score is a sum of exactly-representable
IEEE divisions evaluated in a fixed expression tree — bit-identical
across engines with no transcendental involved, so the operator is
fully oracle-able (unlike raw-score fusion over log-idf BM25).

Scale shape: the inputs are ALREADY top-N lists (bounded per query),
so fusion is a full-outer join + a per-query window over <= 2N rows —
metadata-sized work no matter the corpus. The expensive part of
hybrid retrieval lives upstream in the rankers themselves.

Beyond-reference surface (the reference engine has no retrieval
operators); same extension family as operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    topk: int = 10,
    a_name: str = "a",
    b_name: str = "b",
) -> DataFrame:
    """Fuse two per-query rankings (query_col, doc_col, rank_col) into
    (query_col, fused_rank, doc_col, rrf_r, {a_name}_rank,
    {b_name}_rank).

    rrf = 1/(k_rrf + rank_a) + 1/(k_rrf + rank_b), absent sides
    contributing 0 — the two divisions and one addition are a fixed
    IEEE tree over integer ranks, deterministic across engines
    (rounded at 1e-9 for presentation only; distinct rank pairs stay
    distinct — the minimum score gap at topk<=20, k_rrf=60 is 8.7e-7).
    The fused rank orders by the ROUNDED score then doc id, so both
    engines rank literally the same keys.

    Precondition: each input holds at most ONE row per
    (query_col, doc_col) — the contract every ranker upstream
    (row_number top-N) satisfies by construction. Enforced here:
    each leg keeps its BEST (lowest) rank per key via min-agg, so a
    caller that violates the contract gets the fusion a correct
    ranker would have produced instead of silent fan-out through
    the full-outer join. Inputs are already top-N sized, so the
    extra aggregation is metadata-scale."""
    a = (
        ranked_a.select(
            F.col(query_col),
            F.col(doc_col),
            F.col(rank_col).cast("int").alias("__ra"),
        )
        .groupBy(query_col, doc_col)
        .agg(F.min("__ra").alias("__ra"))
    )
    b = (
        ranked_b.select(
            F.col(query_col),
            F.col(doc_col),
            F.col(rank_col).cast("int").alias("__rb"),
        )
        .groupBy(query_col, doc_col)
        .agg(F.min("__rb").alias("__rb"))
    )
    both = a.join(b, [query_col, doc_col], "full_outer")
    score = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("__ra")),
            F.lit(0.0),
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("__rb")),
            F.lit(0.0),
        ),
        9,
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_r"), F.asc(doc_col)
    )
    return (
        both.withColumn("rrf_r", score)
        .withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= topk)
        .select(
            query_col,
            F.col("fused_rank").cast("int").alias("fused_rank"),
            doc_col,
            "rrf_r",
            F.col("__ra").alias(f"{a_name}_rank"),
            F.col("__rb").alias(f"{b_name}_rank"),
        )
    )


def coordination_rank(
    docs_terms: DataFrame,
    query_terms: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    term_col: str = "term",
    tf_col: str = "tf",
    topk: int = 20,
) -> DataFrame:
    """Integer lexical ranking by coordination-level matching: per
    (query, doc), rank by (number of shared distinct terms DESC, total
    term frequency of shared terms DESC, doc id ASC). All-integer
    scoring — the exact-arithmetic lexical leg for oracle-able hybrid
    retrieval (linear/log BM25 scores would need float-sum ordering
    across a VARIABLE number of terms, which no fixed expression tree
    can make engine-deterministic).

    `docs_terms`: (doc_col, term_col, tf_col) — per-document term
    frequencies (one corpus tokenize + count).
    `query_terms`: (query_col, term_col) — distinct terms per query.

    Plan: one term-keyed join (AQE broadcasts the query side — it is
    |queries|·|vocab-per-query| rows), one (query, doc) aggregation,
    one per-query window over the candidate set. Documents sharing no
    term never appear — postings-sparse, not corpus x queries."""
    from pyspark.sql import Window

    joined = docs_terms.join(
        query_terms, term_col
    ).filter(F.col(doc_col) != F.col(query_col))
    scored = joined.groupBy(query_col, doc_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shared"),
        F.sum(tf_col).cast("long").alias("tf_shared"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("n_shared"), F.desc("tf_shared"), F.asc(doc_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            query_col,
            doc_col,
            F.col("rank").cast("int").alias("rank"),
            "n_shared",
            "tf_shared",
        )
    )
