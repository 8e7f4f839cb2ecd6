"""Training-export preparation: deterministic corpus shuffling into
balanced shards, and the fill-in-middle (FIM) transform.

Two operators every LLM training-data pipeline runs right before the
corpus leaves the lake:

1. `shuffle_shards` — the global pseudo-random shuffle + sharding a
   training run needs (data order is a hyperparameter; correlated
   order — crawl order, domain clumps — measurably hurts loss). A
   true orderBy(rand()) is both non-reproducible and a full range
   exchange; instead every document gets a DETERMINISTIC 60-bit
   md5 key (engine-portable, seed via salt), the shard is the key's
   modulus, and the within-shard position is a rank over the key —
   one hash-partitioned shuffle on the shard key, each shard sorted
   independently (no global sort; the r8 sort gate stays clean).
   Reproducible across runs AND engines, so the driver oracle
   hash-checks the exact shard+position assignment.

2. `fim_transform` — fill-in-middle (Bavarian et al. 2022): a
   deterministic fraction of documents is rewritten
   prefix-suffix-middle with sentinel markers so the model learns
   infilling; split points and the apply-decision are hash-derived
   (reproducible, oracle-able), the rest pass through unchanged. Pure
   string arithmetic per row — no shuffle at all, fully pushdown-able.

Beyond-reference surface (the reference engine has no export
operators); same extension family as operators/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from data_engineering_spark.operators.sketches import uniform_hash60

FIM_PRE, FIM_SUF, FIM_MID = "<|fim_pre|>", "<|fim_suf|>", "<|fim_mid|>"


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuf1",
) -> DataFrame:
    """df + (shard int, shard_pos long): deterministic pseudo-random
    shard assignment and within-shard order.

    shard = h % n_shards, shard_pos = rank of h within the shard
    (md5-keyed, ties broken by id — md5 collisions on distinct ids
    are negligible but the order must be total for reproducibility).
    One shuffle, partitioned BY SHARD (the window's partition key), so
    shards sort independently and in parallel; there is no global
    order and no single-partition window. Balanced by construction:
    md5 is uniform, so shard sizes concentrate at n/n_shards (the
    oracle-checked per-shard stats make skew visible).

    At 100 TB: write with .partitionBy on `shard` (or
    repartition(n_shards, "shard") + sortWithinPartitions) — the
    assignment here is the part worth hash-verifying; the writer
    topology is environment-specific."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive: {n_shards}")
    h = uniform_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit("#" + salt))
    )
    w = Window.partitionBy("shard").orderBy(
        F.asc("__h"), F.asc(id_col)
    )
    return (
        df.withColumn("__h", h)
        .withColumn(
            "shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int")
        )
        .withColumn(
            "shard_pos", (F.row_number().over(w) - 1).cast("long")
        )
        .drop("__h")
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuf1",
) -> None:
    """Materialize the shuffled corpus as shard-partitioned parquet:
    `{out_dir}/shard=K/...` with rows physically ordered by shard_pos
    inside each shard's files — the directory layout a training reader
    consumes (one shard per data-loader worker, sequential reads, no
    runtime shuffle).

    One repartition on the shard key + sortWithinPartitions: each
    shard sorts independently in its own task (no global sort — the
    sort gate stays clean), and partitionBy splits the directories.
    Reproducible end to end: same input + salt => byte-identical shard
    membership and order (the assignment itself is the hash-oracled
    q_corpus_shuffle_shards)."""
    out = shuffle_shards(df, n_shards, id_col=id_col, salt=salt)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fim_rate_pct: int = 50,
    min_chars: int = 32,
    salt: str = "fim1",
) -> DataFrame:
    """(id_col, is_fim boolean, out_text string): fill-in-middle
    rewrite of a deterministic `fim_rate_pct`% of eligible documents
    (length >= min_chars), the rest pass through verbatim.

    For a selected document two split points are hash-derived
    (p1 <= p2, both interior), and the text is re-serialized in PSM
    order: <|fim_pre|>prefix<|fim_suf|>suffix<|fim_mid|>middle — the
    model sees the surrounding context first and learns to produce
    the middle. Every decision is a pure md5 function of (id, salt):
    reproducible across runs, partitions, and engines, which is what
    makes the transform hash-oracle-able (a rand()-based FIM is not).
    Zero shuffles — the whole transform is row-local string math."""
    if not 0 <= fim_rate_pct <= 100:
        raise ValueError(f"fim_rate_pct out of range: {fim_rate_pct}")
    sid = F.col(id_col).cast("string")
    pick = uniform_hash60(F.concat(sid, F.lit("#pick#" + salt)))
    h1 = uniform_hash60(F.concat(sid, F.lit("#p1#" + salt)))
    h2 = uniform_hash60(F.concat(sid, F.lit("#p2#" + salt)))
    n = F.length(text_col)
    # interior cut points in 1..n-1: prefix and suffix are never
    # empty; the middle is empty only when the two cuts coincide
    c1 = (F.pmod(h1, n - 1) + 1).cast("int")
    c2 = (F.pmod(h2, n - 1) + 1).cast("int")
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    is_fim = (
        (n >= min_chars)
        & (F.pmod(pick, F.lit(100)) < fim_rate_pct)
    )
    t = F.col(text_col)
    psm = F.concat(
        F.lit(FIM_PRE),
        t.substr(F.lit(1), lo),
        F.lit(FIM_SUF),
        t.substr(hi + 1, n - hi),
        F.lit(FIM_MID),
        t.substr(lo + 1, hi - lo),
    )
    return df.select(
        F.col(id_col),
        is_fim.alias("is_fim"),
        F.when(is_fim, psm).otherwise(t).alias("out_text"),
    )
