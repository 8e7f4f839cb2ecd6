"""Perplexity filtering — the CCNet recipe (Wenzek et al. 2020,
arXiv:1911.00359), Spark-first.

CCNet scores every document under a language model trained on a
trusted target corpus (Wikipedia) and keeps the low-perplexity band.
The published system uses a KenLM 5-gram; the Spark-shaped analog here
is a HASHED BIGRAM LM over the same machinery DSIR already uses
(operators/dsir.hashed_ngram_buckets emits unigrams AND bigrams into
one bucket space):

    logp(w2 | w1) ≈ log( (c[bucket("w1 w2")] + 1)
                        / (c[bucket("w1")] + B) )

— add-one smoothed conditional with the hashed-count approximation,
exactly the trade DSIR makes (collisions blur counts; B sized so the
blur is noise). Training is one target-corpus scan into a ≤B-row count
table; scoring is one raw-corpus scan + TWO broadcast joins against
that table (bigram bucket and context bucket) + a groupBy(doc) sum.
Nothing scales with document size but the token stream itself.

Distinct from DSIR: DSIR weighs documents by target/raw CONTRAST
(importance resampling); perplexity filtering scores against the
target alone with per-token conditionals — the two stages coexist in
real pipelines (CCNet filters, DSIR selects).

Oracle policy: log/exp are transcendental, so the registry entry is
rows-only (same documented exemption as dsir_log_weights);
tests/test_classifier_bpe.py verifies scores against an independent
pure-python computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_spark.operators.dsir import hashed_ngram_buckets


def train_bigram_lm(
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8192,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """(bucket, c): hashed unigram+bigram counts over the TARGET
    corpus — the LM. At most `num_buckets` rows regardless of corpus
    size, so it broadcasts everywhere."""
    feats = hashed_ngram_buckets(
        target,
        id_col=id_col,
        text_col=text_col,
        num_buckets=num_buckets,
        bucket_hash=bucket_hash,
    )
    return feats.groupBy("bucket").agg(F.sum("c").alias("c"))


def lm_perplexity(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8192,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """(id, n_bigrams, nll, ppl): per-document negative log-likelihood
    under the hashed bigram LM, and perplexity = exp(nll / n_bigrams).

    Documents with no bigram (0- or 1-token text) get NULL nll/ppl —
    unscorable is visible, not silently best-or-worst (the same
    contract as classifier scoring's bias row).

    Plan: the doc bigram stream re-uses hashed_ngram_buckets' row-wise
    construction (unigram rows = context counts, bigram rows = joint
    counts — both already in the same bucket space), two broadcast
    joins against the ≤num_buckets-row LM, one groupBy(doc). The
    context count for "w1 w2" is c[bucket(w1)] of the LEFT word; that
    pairing is rebuilt here with the same lead-window shape (and the
    same generator-trap avoidance) as the feature extractor."""
    from data_engineering_spark.operators.dsir import (
        check_bucket_bound,
    )

    # the LM is broadcast TWICE below (joint + context views): the
    # num_buckets bound is the broadcastability contract, caller-
    # controlled and therefore enforced (r6 verdict item 7)
    check_bucket_bound(num_buckets)

    keyed, joint, ctx = _bigram_keyed(
        docs, lm, id_col, text_col, num_buckets, bucket_hash
    )
    scored = (
        keyed.join(F.broadcast(joint), "b12", "left")
        .join(F.broadcast(ctx), "b1", "left")
        .select(
            "doc",
            (
                F.log(F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1.0))
                - F.log(
                    F.coalesce(F.col("c1"), F.lit(0))
                    + F.lit(float(num_buckets))
                )
            ).alias("__lp"),
        )
    )
    per_doc = scored.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        (-F.sum("__lp")).alias("nll"),
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "nll",
            F.exp(F.col("nll") / F.col("n_bigrams")).alias("ppl"),
        )
    )


def _bigram_stream(docs, id_col, text_col, num_buckets, bucket_hash):
    """(doc, b12, b1): the per-document bigram bucket stream — joint
    bucket of "w1 w2" and context bucket of the LEFT word, in the
    shared LM bucket space."""
    from pyspark.sql import Window

    from data_engineering_spark.operators.dsir import _bucket
    from data_engineering_spark.operators.text import tokens

    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(text_col)).alias("pos", "w"),
    )
    nxt = F.lead("w", 1).over(Window.partitionBy("doc").orderBy("pos"))
    pairs = tok.select("doc", "w", nxt.alias("w2")).filter(
        F.col("w2").isNotNull()
    )
    return pairs.select(
        "doc",
        _bucket(
            F.concat_ws(" ", "w", "w2"), num_buckets, bucket_hash
        ).alias("b12"),
        _bucket(F.col("w"), num_buckets, bucket_hash).alias("b1"),
    )


def _bigram_keyed(docs, lm, id_col, text_col, num_buckets, bucket_hash):
    """(keyed, joint, ctx): the per-doc bigram bucket stream and the
    LM's two keyed views — the shared front half of lm_perplexity and
    lm_bigram_stats."""
    keyed = _bigram_stream(
        docs, id_col, text_col, num_buckets, bucket_hash
    )
    joint = lm.select(
        F.col("bucket").alias("b12"), F.col("c").alias("c12")
    )
    ctx = lm.select(F.col("bucket").alias("b1"), F.col("c").alias("c1"))
    return keyed, joint, ctx


def lm_nll_nano(
    docs: DataFrame,
    lm_q: DataFrame,
    q1_floor: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8192,
    bucket_hash: str = "md5",
) -> DataFrame:
    """(id, n_bigrams, nll_nano): per-document negative log-likelihood
    in integer NANO-NATS under a pre-quantized bigram LM — the
    hash-oracle-able form of lm_perplexity (VERDICT r10 #3a).

    `lm_q` is the quantized LM (bucket, q12, q1) with q12 =
    round(ln(c+1)·1e9) and q1 = round(ln(c+B)·1e9) computed ONCE in
    pure python (queries/_fixtures.seed_lm_logq_fixture — the
    operators/unigram.py Viterbi-score convention), so per-document
    nll_nano = Σ(q1 − q12) is an exact int64 sum both engines replay
    bit-identically. `q1_floor` = round(ln(B)·1e9) covers context
    buckets absent from the LM; absent joint buckets contribute
    ln(0+1) = 0 exactly. Unscorable documents (0- or 1-token text)
    report n_bigrams = 0 with nll_nano = 0 — visible via the count,
    and the all-int64 column dodges the nullable-int → float dtype
    wobble in pandas-side compares.

    Plan: identical to lm_perplexity — one token scan, two broadcast
    joins against the ≤num_buckets-row quantized LM, one groupBy(doc).
    Float math: none. ppl = exp(nll_nano/1e9/n_bigrams) is derivable
    downstream when a float is wanted."""
    from data_engineering_spark.operators.dsir import (
        check_bucket_bound,
    )

    check_bucket_bound(num_buckets)
    keyed = _bigram_stream(
        docs, id_col, text_col, num_buckets, bucket_hash
    )
    joint = lm_q.select(
        F.col("bucket").alias("b12"), F.col("q12").alias("__q12")
    )
    ctx = lm_q.select(
        F.col("bucket").alias("b1"), F.col("q1").alias("__q1")
    )
    per_doc = (
        keyed.join(F.broadcast(joint), "b12", "left")
        .join(F.broadcast(ctx), "b1", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(
                F.coalesce(F.col("__q1"), F.lit(q1_floor))
                - F.coalesce(F.col("__q12"), F.lit(0))
            )
            .cast("long")
            .alias("nll_nano"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0))
            .cast("long")
            .alias("n_bigrams"),
            F.coalesce("nll_nano", F.lit(0))
            .cast("long")
            .alias("nll_nano"),
        )
    )


def lm_bigram_stats(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8192,
    bucket_hash: str = "md5",
) -> DataFrame:
    """(id, n_bigrams, sum_c12, sum_c1): the INTEGER core of the
    perplexity filter — per-document bigram count and the summed
    joint/context LM lookups that feed lm_perplexity's logs.  Pure
    fixed-point arithmetic end to end, so a DuckDB oracle recomputes
    the entire inference path (tokenize → md5 buckets → LM counts →
    lookups → sums) bit-exactly; only the final log/exp of
    lm_perplexity stays under the transcendental exemption (r6
    verdict item 4).  Default bucket_hash is 'md5' (engine-portable)
    for exactly that reason."""
    from data_engineering_spark.operators.dsir import (
        check_bucket_bound,
    )

    check_bucket_bound(num_buckets)
    keyed, joint, ctx = _bigram_keyed(
        docs, lm, id_col, text_col, num_buckets, bucket_hash
    )
    per_doc = (
        keyed.join(F.broadcast(joint), "b12", "left")
        .join(F.broadcast(ctx), "b1", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("c12"), F.lit(0)))
            .cast("long")
            .alias("sum_c12"),
            F.sum(F.coalesce(F.col("c1"), F.lit(0)))
            .cast("long")
            .alias("sum_c1"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("sum_c12", F.lit(0)).alias("sum_c12"),
            F.coalesce("sum_c1", F.lit(0)).alias("sum_c1"),
        )
    )
