"""Training-data pipeline queries: deterministic sampling and document
chunking over the `documents` table (SURVEY.md §2.11 family).

All randomness is md5-hash-derived, so every query is a deterministic
function of the data and hash-checks against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.sampling import (
    bernoulli_sample,
    stratified_topk_sample,
)
from data_engineering_spark.operators.sketches import HASH_SPACE
from data_engineering_spark.operators.text import chunk_documents
from data_engineering_spark.registry import query

_T10 = int(0.1 * HASH_SPACE)  # exact integer threshold for rate=0.1


@query(
    "q_doc_bernoulli_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 15))
          ::BIGINT < {_T10}
    """,
)
def q_doc_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli corpus sample (salt 'v1'): each doc's
    keep/drop decision is a pure function of its id, so the sample is
    reproducible across runs, engines and resumptions — unlike
    df.sample()'s partition-seeded RNG. Pure filter, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return bernoulli_sample(d, "doc_id", 0.1, salt="v1").select(
        "doc_id", "lang", "n_chars"
    )


@query(
    "q_doc_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 's1'),
                         1, 15))::BIGINT, doc_id) AS rn
      FROM documents)
    WHERE rn <= 20
    """,
)
def q_doc_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 docs per language, uniformly without replacement via
    smallest id-hashes ('balance the corpus by stratum' shape). One
    shuffle on the stratum + capped row_number window."""
    d = load_table(spark, sf_dir, "documents")
    return stratified_topk_sample(
        d, strata=["lang"], id_col="doc_id", k=20, salt="s1"
    ).select("doc_id", "lang")


@query(
    "q_doc_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    d AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= 40 THEN 1
                  ELSE ((len(toks) - 40 + 31) // 32) + 1 END AS nc
      FROM t),
    e AS (
      SELECT doc_id, toks, n, unnest(range(0, nc)) AS i FROM d)
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST(least(40, n - i * 32) AS INT) AS n_tokens,
           array_to_string(toks[i*32 + 1 : i*32 + 40], ' ') AS chunk_text
    FROM e
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window document chunking (40-token chunks, 8-token
    overlap → stride 32): the context-packing primitive of an LLM data
    pipeline. Entirely shuffle-free — tokenize + index generator +
    slice/join projection inside the scan stage."""
    d = load_table(spark, sf_dir, "documents")
    out = chunk_documents(
        d, "doc_id", "text", chunk_tokens=40, overlap=8
    )
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "n_tokens",
        "chunk_text",
    )


@query(
    "q_doc_pack_bins",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    d AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= 40 THEN 1
                  ELSE ((len(toks) - 40 + 31) // 32) + 1 END AS nc
      FROM t),
    e AS (
      SELECT doc_id, n, unnest(range(0, nc)) AS i FROM d),
    c AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             CAST(least(40, n - i * 32) AS INT) AS n_tokens
      FROM e),
    packed AS (
      SELECT doc_id, chunk_idx, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY doc_id ORDER BY chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) // 128 AS INT) AS pack_id
      FROM c)
    SELECT doc_id, pack_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(MIN(chunk_idx) AS INT) AS first_chunk
    FROM packed GROUP BY doc_id, pack_id
    """,
)
def q_doc_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: the 40/8 chunks of each document packed into
    128-token training bins (greedy running-total assignment within the
    document — the distributed formulation; see
    operators/text.pack_chunks). Output: per-bin chunk count, token
    total and first chunk."""
    from data_engineering_spark.operators.text import (
        chunk_documents,
        pack_chunks,
    )

    d = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(d, "doc_id", "text", chunk_tokens=40, overlap=8)
    packed = pack_chunks(
        chunks, budget_tokens=128,
        partition_cols=("doc_id",), order_cols=("chunk_idx",),
    )
    return packed.groupBy("doc_id", "pack_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        F.min("chunk_idx").cast("int").alias("first_chunk"),
    )


@query(
    "q_doc_weighted_sample",
    oracle=f"""
    WITH m AS (
      SELECT CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(n_chars) AS mean_w
      FROM documents)
    SELECT doc_id, lang, n_chars,
           CAST(1.0 AS DOUBLE)
             / least(CAST(1.0 AS DOUBLE),
                     CAST(0.1 AS DOUBLE) * n_chars / mean_w)
             AS sample_weight
    FROM documents, m
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'w1'), 1, 15))
               ::BIGINT AS DOUBLE) / {HASH_SPACE}
          < least(CAST(1.0 AS DOUBLE),
                  CAST(0.1 AS DOUBLE) * n_chars / mean_w)
    """,
)
def q_doc_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling by document length: keep probability
    min(1, 0.1 * n_chars / mean_chars), hash-keyed (deterministic),
    emitting the Horvitz-Thompson inverse-probability weight. Long docs
    oversampled, aggregates reweightable to unbiased estimates."""
    from data_engineering_spark.operators.sampling import (
        weighted_bernoulli_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    return weighted_bernoulli_sample(
        d, "doc_id", "n_chars", target_rate=0.1, salt="w1"
    ).select("doc_id", "lang", "n_chars", "sample_weight")


@query(
    "q_doc_debiased_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, COUNT(*) OVER (PARTITION BY text) AS n_copies
      FROM documents)
    SELECT doc_id, lang, CAST(n_copies AS BIGINT) AS n_copies,
           CAST(1.0 AS DOUBLE)
             / least(CAST(1.0 AS DOUBLE),
                     CAST(0.2 AS DOUBLE) / n_copies) AS sample_weight
    FROM w
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'fd1'), 1, 15))
               ::BIGINT AS DOUBLE) / {HASH_SPACE}
          < least(CAST(1.0 AS DOUBLE), CAST(0.2 AS DOUBLE) / n_copies)
    """,
)
def q_doc_debiased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware sampling: keep probability min(1, 0.2/n_copies)
    per exact-content group, so each distinct text contributes ~0.2
    expected rows however many copies the crawl holds. Spark groups on
    the sha2 fingerprint (content never shuffles); the oracle groups on
    raw text — identical up to SHA-256 collision."""
    from data_engineering_spark.operators.sampling import (
        frequency_debiased_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    return frequency_debiased_sample(
        d, "doc_id", ["text"], target_rate=0.2, salt="fd1"
    ).select("doc_id", "lang", "n_copies", "sample_weight")


_DSIR_K = 100  # selection size, shared by the query and its rows twin


@query(
    "q_doc_dsir_select",
    # rows-only: log()/Gumbel tail outside the hash policy; the row
    # structure is exact — Gumbel top-k keeps exactly min(k, n) docs
    rows_oracle=f"""
    SELECT doc_id, CAST(0.0 AS DOUBLE) AS log_w_r,
           CAST(0.0 AS DOUBLE) AS gumbel_key_r
    FROM documents ORDER BY doc_id LIMIT {_DSIR_K}
    """,
    # [] = only the row COUNT is exact: Gumbel top-k MEMBERSHIP depends
    # on the log/exp tail, so even doc_id is out of twin reach here
    rows_key_cols=[],
)
def q_doc_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR corpus selection (Xie et al. 2023): hashed unigram+bigram
    importance weights toward a target domain (source='src1' as the
    curated slice) and Gumbel top-k resampling — the
    importance-weighted way to tilt a 100 TB crawl toward a quality
    distribution. Rows-only driver check: log() is a transcendental,
    outside the repo's cross-engine oracle policy (libm last-ulp
    divergence); tests/test_dsir.py verifies the weight math against
    an independent numpy computation, and q_doc_dsir_bucket_stats
    oracles the ENTIRE integer path (features → buckets → both models
    → count-weighted lookups) — only this query's log/Gumbel tail
    remains outside the oracle."""
    from data_engineering_spark.operators.dsir import dsir_select

    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("source") == "src1")
    # target_subset=False here: at bench scale the target slice's
    # tokenize is cheaper than persisting the corpus feature frame (A/B
    # measured 2.4s vs 3.8s at sf0.1); the subset path wins when the
    # corpus scan dominates — see dsir_log_weights
    return dsir_select(d, target, k=_DSIR_K).select(
        "doc_id",
        F.round("log_w", 6).alias("log_w_r"),
        F.round("gumbel_key", 6).alias("gumbel_key_r"),
    )


_DSB = 8192  # DSIR bucket count (matches dsir_log_weights default)


@query(
    "q_doc_dsir_bucket_stats",
    oracle=f"""
    WITH dtok AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS t
      FROM documents),
    feats AS (
      SELECT doc_id, source, unnest(t) AS f FROM dtok
      UNION ALL
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS f
      FROM dtok),
    fc AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(f), 1, 15))::BIGINT % {_DSB} AS bucket,
             COUNT(*) AS c
      FROM feats GROUP BY 1, 2, 3),
    tgt AS (
      SELECT bucket, SUM(c) AS ct FROM fc
      WHERE source = 'src1' GROUP BY 1),
    raw AS (SELECT bucket, SUM(c) AS cr FROM fc GROUP BY 1),
    per AS (
      SELECT fc.doc_id,
             SUM(fc.c) AS n_feats,
             SUM(fc.c * COALESCE(t.ct, 0)) AS dot_target,
             SUM(fc.c * r.cr) AS dot_raw
      FROM fc
      LEFT JOIN tgt t ON fc.bucket = t.bucket
      JOIN raw r ON fc.bucket = r.bucket
      GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_feats, 0) AS BIGINT) AS n_feats,
           CAST(COALESCE(p.dot_target, 0) AS BIGINT) AS dot_target,
           CAST(COALESCE(p.dot_raw, 0) AS BIGINT) AS dot_raw
    FROM documents d LEFT JOIN per p USING (doc_id)
    """,
)
def q_doc_dsir_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INTEGER core of DSIR importance weighting, fully oracled
    (r6 verdict item 4): per-document feature count and count-weighted
    dot products against the target (source='src1', mirroring
    q_doc_dsir_select) and raw bucket models — the exact fixed-point
    c·cb sums whose smoothed logs the weight takes.  md5 buckets so
    DuckDB recomputes feature hashing, both models and the lookups
    bit-exactly; only the log/Gumbel tail of the sibling stays
    oracle-exempt."""
    from data_engineering_spark.operators.dsir import (
        dsir_bucket_stats,
    )

    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("source") == "src1")
    return dsir_bucket_stats(
        d, target, num_buckets=_DSB, bucket_hash="md5"
    )
