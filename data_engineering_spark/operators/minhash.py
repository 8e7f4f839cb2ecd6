"""MinHash + banded LSH near-duplicate detection (SURVEY.md §2.11).

The 100 TB near-dup path: instead of the exact prefix-filter join
(text.ngram_jaccard_pairs), each document is reduced to `num_hashes`
minhash values (min over its shingles of k seeded xxhash64 functions);
bands of consecutive signature values are hashed to buckets and
candidate pairs are doc pairs sharing any band bucket. Candidates are
then verified with the EXACT Jaccard (shingle-set intersection), so the
operator can only miss pairs (banding recall), never invent them.

Default banding (64 hashes → 32 bands × 2 rows) detects
P(candidate | jaccard=j) = 1 - (1 - j²)³²:
    j=0.4 → 0.996    j=0.6 → ~1 - 1e-6    j=0.8 → 1 - 7e-15
so recall at the 0.6 threshold is effectively 1, while pairs with
j ≈ 0.05 survive banding only ~8% of the time and are then discarded
by the exact verify.

Everything is JVM builtins: xxhash64 for the hash family (seed column
varies the function), one groupBy for signatures, one explode+equi-join
for banding. No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_spark.operators.text import tokens


def shingle_rows(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct (doc, shingle) rows, row-built for linear cost (see
    text.ngram_jaccard_pairs for why arrays-under-explode are avoided)."""
    from pyspark.sql import Window

    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(text_col)).alias("pos", "w"),
    )
    wspec = Window.partitionBy("doc").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", j).over(wspec) for j in range(1, n)]
    return (
        tok.select(
            "doc",
            F.concat_ws(" ", *parts).alias("g"),
            F.lead("w", n - 1).over(wspec).alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .select("doc", "g")
        .distinct()
    )


def minhash_signatures(
    shingle_df: DataFrame, num_hashes: int = 64
) -> DataFrame:
    """(doc, h0..h{k-1}) minhash signature per document — one shuffle.

    hash_i(g) = xxhash64(g, i): the seed literal varies the function;
    xxhash64 is a well-mixed 64-bit hash, so the k functions are
    effectively independent."""
    aggs = [
        F.min(F.xxhash64(F.col("g"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingle_df.groupBy("doc").agg(*aggs)


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    num_hashes: int = 64,
    num_bands: int = 32,
    release_cache: bool = False,
) -> DataFrame:
    """Near-duplicate pairs with exact-verified Jaccard >= threshold,
    candidates via banded MinHash-LSH. Output matches
    text.ngram_jaccard_pairs: (doc_a, doc_b, common, jaccard_r).

    ``release_cache=True``: eagerly materialize the (small) verified
    pairs and unpersist the shingle/candidate caches before returning —
    for long-lived sessions that must not accumulate cached blocks.
    Default False keeps the plan lazy (the eager pass costs real time;
    LRU eviction handles one-shot pipelines fine)."""
    assert num_hashes % num_bands == 0
    rows_per_band = num_hashes // num_bands

    # two consumers (signatures + verify sets) → persist, same rationale
    # as text.ngram_jaccard_pairs
    from pyspark import StorageLevel

    sh = shingle_rows(docs, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = minhash_signatures(sh, num_hashes)

    bands = sigs.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[
                        F.col(f"h{b * rows_per_band + j}")
                        for j in range(rows_per_band)
                    ]).alias("bucket"),
                )
                for b in range(num_bands)
            ])
        ).alias("bb"),
    ).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )

    a = bands.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b = bands.select(F.col("doc").alias("doc_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        # three consumers (two sides of the doc prune + verify join)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # exact verify (same as the prefix-filter join's verify stage):
    # shingle sets are collected ONLY for candidate docs — at corpus
    # scale collect_list over non-candidates would dominate
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc"))
        .union(cands.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    sets = (
        sh.join(cand_docs, "doc", "left_semi")
        .groupBy("doc")
        .agg(F.collect_list("g").alias("sh"))
    )
    sa = sets.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    result = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.col("common").cast("long").alias("common"),
            # raw int/int division is bit-identical across engines;
            # re-rounding it would reintroduce boundary divergence
            F.col("jaccard").alias("jaccard_r"),
        )
    )
    if not release_cache:
        return result
    out = result.localCheckpoint(eager=True)
    cands.unpersist()
    sh.unpersist()
    return out
