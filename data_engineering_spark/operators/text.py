"""Text-analysis operators over document tables (SURVEY.md §2.11).

All pure-JVM column expressions (no Python UDFs): tokenization via
`split`, shingling via `transform` over index sequences, counting via
`size`/`filter`. Designed so the only shuffles are the final group-bys /
inverted-index joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small multilingual stopword sample — enough for quality ratios and a
# deterministic language heuristic; swap for a real list in production.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "de", "et", "que"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; `trim` first so edges don't yield empty
    tokens (mirrors DuckDB string_split_regex on trimmed text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_count(col: Column | str, words: list[str]) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words)))


def punct_count(col: Column | str, klass: str = r"[^.!?,;]") -> Column:
    """Punctuation chars = length after deleting everything else."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, klass, ""))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Documents shorter than `n` tokens yield an empty array (guarded —
    `sequence(0, negative)` would otherwise generate a descending range).
    """
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via a shingle inverted
    index — the scalable formulation of all-pairs set similarity:

      explode shingles → self-equi-join on shingle → count common per
      pair → jaccard = common / (|A| + |B| - common).

    Work is Σ (docs-per-shingle)², not |docs|² — at 100 TB, hot shingles
    are the skew risk; mitigate upstream by dropping ultra-frequent
    shingles (stop-shingle filter) or via MinHash-LSH (see minhash.py).
    Output: (doc_a, doc_b, common, jaccard_r).
    """
    sh = docs.select(
        F.col(id_col).alias("doc"), shingles(text_col, n).alias("sh")
    )
    sized = sh.select("doc", F.size("sh").alias("n_sh"), "sh")
    inv = sized.select("doc", "n_sh", F.explode("sh").alias("g"))
    a = inv.select(
        F.col("doc").alias("doc_a"), F.col("n_sh").alias("na"), "g"
    )
    b = inv.select(
        F.col("doc").alias("doc_b"), F.col("n_sh").alias("nb"), "g"
    )
    pairs = (
        a.join(b, ["g"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.col("common").cast("long").alias("common"),
            F.round("jaccard", 6).alias("jaccard_r"),
        )
    )


def language_score(col: Column | str, lang: str) -> Column:
    """Deterministic stopword-hit score for one language (language-ID
    heuristic building block): fraction of tokens that are stopwords."""
    words = STOPWORDS[lang]
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def guess_language(col: Column | str) -> Column:
    """argmax over language_score; 'und' when no stopwords hit at all."""
    c = F.col(col) if isinstance(col, str) else col
    scores = F.array(*[
        F.struct(
            language_score(c, lang).alias("score"), F.lit(lang).alias("lang")
        )
        for lang in sorted(STOPWORDS)
    ])
    best = F.array_max(scores)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def simhash64(col: Column | str, n: int = 3) -> Column:
    """64-bit SimHash over n-gram shingles, pure JVM expressions.

    Each shingle's xxhash64 votes its bits; the fingerprint's bit i is 1
    when the majority of shingles have bit i set. Near-duplicates then
    reduce to small-Hamming-distance fingerprint pairs, which at scale are
    found by banding the 64 bits into chunks and equi-joining (same
    inverted-index trick as MinHash-LSH but on bit-bands).
    """
    sh = shingles(col, n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    cnt = F.size(sh)

    def bit_vote(i: int) -> Column:
        ones = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("int"),
        )
        return F.when(ones * 2 >= cnt, F.lit(1)).otherwise(F.lit(0))

    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + (bit_vote(i).cast("long") * F.lit(2 ** i if i < 63 else -(2 ** 63)).cast("long"))
    return fp
