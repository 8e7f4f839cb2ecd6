"""Training-data decontamination: n-gram overlap against an eval set.

The standard pre-training hygiene step (GPT-3 appendix C's 13-gram
dedup, PaLM/Llama's n-gram decontamination): any training document
sharing an n-gram with a benchmark/eval document is flagged (or
dropped) so downstream eval numbers measure generalization, not
memorization. Beyond-reference surface (same extension family as
operators/dsir.py); the reference engine has no text operators.

Spark-first shape, and why it holds at 100 TB:

- The EVAL side is small by definition (benchmarks are thousands of
  documents, not billions). Its distinct n-gram set is aggregated once
  and BROADCAST — bounded and ENFORCED (`max_eval_grams`, the same
  loud-bound contract as operators/dsir.check_bucket_bound) rather
  than assumed.
- The CORPUS side pays exactly one scan: tokenize → distinct n-grams
  per doc (linear, the materialized-token-array idiom of
  operators/text.shingles_from_tokens) → broadcast-hash semi/left
  join → fixed-width per-doc aggregate. No corpus-keyed shuffle other
  than the (doc_id, counts) reduction; nothing corpus-sized ever
  crosses the network.
- Matching is on the GRAM STRING (engine-portable, hash-exact in the
  DuckDB twin); a production variant at extreme gram cardinality would
  swap in uniform_hash60 grams for fixed-width broadcast rows — the
  join shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_spark.operators.text import shingled


def eval_gram_set(
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 8,
    max_eval_grams: int = 10_000_000,
) -> DataFrame:
    """(gram): the distinct n-gram set of the eval corpus — the
    broadcast side. Bounded LOUDLY: more than `max_eval_grams` distinct
    grams means the "eval set" is not an eval set (or n is far too
    small) and the broadcast would melt executors; the probe is a
    limit(N+1) count, never a full count."""
    grams = (
        shingled(
            eval_docs.select(
                F.lit(0).alias("__eid"), F.col(text_col)
            ),
            "__eid",
            text_col,
            n=n,
            out_col="__g",
        )
        .select(F.explode("__g").alias("gram"))
        .distinct()
    )
    # one materialization, not two: the bound probe used to execute
    # the eval shingle pipeline once and the consumer's broadcast
    # build executed it AGAIN — persist so the probe's partial scan
    # seeds the cache and the consumer's broadcast build completes it
    # (subsequent actions reuse). Catalog-tracked MEMORY_AND_DISK, the
    # same carry contract as text.ngram_jaccard_pairs' internal
    # persists: freed by clearCache / LRU, bounded by the loud gram
    # cap below. The probe stays limit(N+1), never a full count: a
    # pathological "eval set" is caught after materializing ~N+1 rows.
    from pyspark import StorageLevel

    cached = grams.persist(StorageLevel.MEMORY_AND_DISK)
    if cached.limit(max_eval_grams + 1).count() > max_eval_grams:
        cached.unpersist(blocking=False)
        raise ValueError(
            f"eval n-gram set exceeds max_eval_grams={max_eval_grams}: "
            "not broadcastable — raise n, shrink the eval set, or "
            "raise the bound explicitly"
        )
    return cached


def contamination_stats(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
    max_eval_grams: int = 10_000_000,
) -> DataFrame:
    """(id_col, n_grams, n_contaminated, contaminated) for EVERY corpus
    document: its distinct n-gram count, how many of those appear in
    the eval set, and the keep/drop verdict (any overlap = flagged —
    the GPT-3 rule; callers wanting a laxer threshold filter on the
    counts). Documents shorter than n tokens have n_grams = 0 and are
    never contaminated."""
    grams = F.broadcast(
        eval_gram_set(eval_docs, eval_text_col, n, max_eval_grams)
    )
    doc_grams = shingled(corpus, id_col, text_col, n=n, out_col="__g")
    inv = doc_grams.select(
        F.col(id_col),
        F.size("__g").alias("__ng"),
        F.explode_outer("__g").alias("gram"),
    )
    hits = inv.join(grams.withColumn("__hit", F.lit(1)), "gram", "left")
    return hits.groupBy(id_col).agg(
        F.max("__ng").cast("long").alias("n_grams"),
        F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias(
            "n_contaminated"
        ),
        (F.sum(F.coalesce("__hit", F.lit(0))) > 0).alias("contaminated"),
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
    max_eval_grams: int = 10_000_000,
) -> DataFrame:
    """The cleaned corpus: every column of `corpus`, minus documents
    sharing any n-gram with the eval set. One corpus scan for the
    stats + a left-semi join back on id (the stats frame is
    corpus-keyed but fixed-width)."""
    keep = contamination_stats(
        corpus, eval_docs, id_col, text_col, eval_text_col, n,
        max_eval_grams,
    ).filter(~F.col("contaminated")).select(id_col)
    return corpus.join(keep, id_col, "left_semi")
