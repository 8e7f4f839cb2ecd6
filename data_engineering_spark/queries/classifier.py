"""Quality-classifier scoring and BPE pair-induction queries.

Both operators are engine-portable by construction (md5 bucket hash,
integer weights, ASCII pair symbols), so their DuckDB twins recompute
the full pipeline — features, buckets, weights, logits — bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.bpe import bpe_top_pairs
from data_engineering_spark.operators.classifier import (
    classifier_filter_stats,
    linear_classifier_score,
    synthetic_weights,
)
from data_engineering_spark.registry import query

_B = 4096  # feature buckets
_SCALE = 1000  # weight range [-1000, 1000]
_SEED = "clsw"
_BIAS = -2500

# features → md5 buckets → synthetic integer weights → per-doc logit.
# Parameterized over the source relation so the curation funnel can
# score its exact-dedup survivors with the same model
# (queries/curation.py's classifier-gated funnel oracle).
def classifier_score_cte(src: str) -> str:
    # the CASE guard mirrors operators/text.tokens: bare
    # string_split_regex yields [''] for empty/whitespace text (a
    # phantom unigram that would pick up a hashed weight) where the
    # Spark side maps it to an empty array (logit = bias alone)
    return f"""
    tok AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS t
      FROM {src}),
    uni AS (SELECT doc_id, unnest(t) AS f FROM tok),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS f
      FROM tok),
    feats AS (
      SELECT doc_id, f FROM uni UNION ALL SELECT doc_id, f FROM bi),
    fc AS (
      SELECT doc_id,
             ('0x' || substr(md5(f), 1, 15))::BIGINT % {_B} AS bucket,
             COUNT(*) AS c
      FROM feats GROUP BY 1, 2),
    w AS (
      SELECT b AS bucket,
             ('0x' || substr(md5(CAST(b AS VARCHAR) || '|{_SEED}'),
              1, 15))::BIGINT % {2 * _SCALE + 1} - {_SCALE} AS weight
      FROM range({_B}) r(b)),
    s AS (
      SELECT fc.doc_id, SUM(fc.c * w.weight) AS raw
      FROM fc JOIN w USING (bucket) GROUP BY 1),
    scored AS (
      SELECT d.doc_id,
             CAST(COALESCE(s.raw, 0) + {_BIAS} AS BIGINT) AS logit
      FROM {src} d LEFT JOIN s USING (doc_id))
"""




def _score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = synthetic_weights(spark, _B, seed=_SEED, scale=_SCALE)
    return linear_classifier_score(
        d, w, num_buckets=_B, bias=_BIAS, bucket_hash="md5"
    )


@query(
    "q_doc_quality_classifier",
    oracle=f"""
    WITH {classifier_score_cte("documents")}
    SELECT doc_id, logit, logit > 0 AS label FROM scored
    """,
)
def q_doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality gate scored over every document:
    hashed unigram+bigram counts × a broadcast integer weight table →
    logit, threshold at 0 (operators/classifier.py). The weights here
    are the deterministic md5 stand-in for a trained model, so the
    oracle recomputes the ENTIRE inference path — tokenization,
    feature hashing, weight lookup, fixed-point accumulation —
    bit-exactly."""
    return _score(spark, sf_dir)


@query(
    "q_doc_classifier_lang_stats",
    oracle=f"""
    WITH {classifier_score_cte("documents")}
    SELECT d.source, d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN sc.logit > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(sc.logit) AS BIGINT) AS sum_logit
    FROM documents d JOIN scored sc USING (doc_id)
    GROUP BY 1, 2
    """,
)
def q_classifier_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) keep/drop accounting of the classifier gate —
    the report read before committing to a threshold. Integer sums
    only (operators/classifier.classifier_filter_stats)."""
    d = load_table(spark, sf_dir, "documents")
    return classifier_filter_stats(
        _score(spark, sf_dir), d, ["source", "lang"]
    )


@query(
    "q_doc_bpe_top_pairs",
    oracle="""
    WITH tok AS (
      SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents),
    wds AS (SELECT unnest(t) AS word FROM tok),
    v AS (
      SELECT word, COUNT(*) AS freq FROM wds
      WHERE regexp_matches(word, '^[!-~]+$') GROUP BY 1),
    prs AS (
      SELECT word, freq,
             unnest(list_transform(range(1, length(word)),
                    i -> substr(word, i, 2))) AS pair
      FROM v WHERE length(word) >= 2),
    agg AS (
      SELECT pair,
             CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words,
             CAST(SUM(freq) AS BIGINT) AS total
      FROM prs GROUP BY 1)
    SELECT pair, n_words, total FROM agg
    ORDER BY total DESC, pair ASC LIMIT 50
    """,
)
def q_doc_bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 BPE merge candidates (adjacent ASCII character pairs over
    the word multiset) — the counting pass of tokenizer training,
    reduced to the vocabulary after one corpus shuffle
    (operators/bpe.py). Total order (total DESC, pair ASC)."""
    d = load_table(spark, sf_dir, "documents")
    return bpe_top_pairs(d, k=50)


@query("q_doc_lm_perplexity")  # rows-only: log/exp are out of oracle policy
def q_doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filter (operators/lm.py): a hashed bigram
    LM trained on the English slice scores every document; low
    perplexity = target-like. Rows-only by the documented
    transcendental exemption (same as dsir_log_weights);
    tests/test_classifier_bpe.py verifies the scores against a pure
    python model."""
    from data_engineering_spark.operators.lm import (
        lm_perplexity,
        train_bigram_lm,
    )

    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en")
    lm = train_bigram_lm(target)
    return lm_perplexity(d, lm)
