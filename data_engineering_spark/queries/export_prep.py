"""Training-export preparation queries (operators/export_prep.py):
deterministic corpus shuffle-sharding and the fill-in-middle
transform. Every decision in both operators is a pure md5 function of
(doc_id, salt), so the DuckDB twins reproduce the exact assignments
and rewritten strings — full hash oracles for what are usually
rand()-based (and therefore unverifiable) pipeline stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (parity imports)

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import query

_N_SHARDS = 8


@query(
    "q_corpus_shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#shuf1'),
                             1, 15))::BIGINT AS hv
      FROM documents)
    SELECT doc_id, CAST(hv % {_N_SHARDS} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY hv % {_N_SHARDS} ORDER BY hv, doc_id
           ) - 1 AS BIGINT) AS shard_pos
    FROM h
    """,
)
def q_corpus_shuffle_shards(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic global shuffle into {_N_SHARDS} balanced training
    shards: (doc_id, shard, shard_pos). Data order is a training
    hyperparameter — this is the reproducible, engine-verifiable
    version of orderBy(rand()) + file split, with one hash-partitioned
    shuffle and NO global sort (shards rank independently)."""
    from data_engineering_spark.operators.export_prep import (
        shuffle_shards,
    )

    d = load_table(spark, sf_dir, "documents")
    return shuffle_shards(d, _N_SHARDS).select(
        "doc_id", "shard", "shard_pos"
    )


@query(
    "q_doc_fim_transform",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, length(text) AS n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#pick#fim1'),
                             1, 15))::BIGINT % 100 AS pick,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#p1#fim1'),
                             1, 15))::BIGINT AS h1,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#p2#fim1'),
                             1, 15))::BIGINT AS h2
      FROM documents),
    c AS (
      SELECT doc_id, text, n,
             (n >= 32 AND pick < 50) AS is_fim,
             CASE WHEN n >= 32 THEN least(h1 % (n - 1) + 1,
                                          h2 % (n - 1) + 1) END AS lo,
             CASE WHEN n >= 32 THEN greatest(h1 % (n - 1) + 1,
                                             h2 % (n - 1) + 1) END AS hi
      FROM b)
    SELECT doc_id, is_fim,
           CASE WHEN is_fim THEN
             '<|fim_pre|>' || substr(text, 1, lo) ||
             '<|fim_suf|>' || substr(text, hi + 1, n - hi) ||
             '<|fim_mid|>' || substr(text, lo + 1, hi - lo)
           ELSE text END AS out_text
    FROM c
    """,
)
def q_doc_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-middle rewrite (Bavarian et al. 2022) of a
    deterministic 50% of eligible documents (>= 32 chars):
    (doc_id, is_fim, out_text) with PSM sentinel serialization. Split
    points and the apply decision are md5-derived, so the oracle
    reproduces the exact rewritten strings; zero shuffles (row-local
    string arithmetic — the plan is scan + project)."""
    from data_engineering_spark.operators.export_prep import (
        fim_transform,
    )

    d = load_table(spark, sf_dir, "documents")
    return fim_transform(d)
