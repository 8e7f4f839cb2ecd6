"""BPE merge-pair induction — the inner counting step of tokenizer
training (Sennrich et al. 2016), Spark-first.

A BPE trainer repeats: count adjacent symbol pairs across the word
multiset, merge the most frequent pair, re-segment. The expensive part
at corpus scale is the COUNTING pass; the merge loop itself runs over
the distinct-word vocabulary, which is tiny next to the corpus. This
module implements that counting pass as two aggregations:

1. corpus → (word, freq): one corpus-sized shuffle, but the rows are
   single words and the reduction is a plain count — after this the
   working set is the VOCABULARY (≈ 10⁵–10⁷ rows at any corpus size,
   Heaps' law), not the corpus.
2. vocabulary → (pair, n_words, total): substring pairs per distinct
   word, weighted by word frequency. Quadratic only in word length
   (bounded), linear in vocabulary.

So a 100 TB corpus pays one word-count shuffle and then works on
megabytes. This is exactly why BPE training is feasible at all, and
the Spark plan mirrors it.

Beyond-reference surface (same extension family as operators/dsir.py);
the reference engine has no text operators.

Symbols here are ASCII characters (first trainer iteration): words are
pre-filtered to printable ASCII (`^[!-~]+$`) so that pair extraction by
code unit is identical across engines — Spark strings index by UTF-16
code units, DuckDB by codepoint, and astral text would silently
diverge (the same pitfall operators/curation.py documents for length).
Real trainers normalize/pre-tokenize similarly before byte- or
char-level BPE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_spark.operators.text import tokens

_ASCII_WORD = "^[!-~]+$"


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    ascii_only: bool = True,
) -> DataFrame:
    """(word, freq) over the whitespace-token multiset — aggregation 1
    of the BPE counting pass. The only corpus-sized shuffle."""
    w = docs.select(F.explode(tokens(text_col)).alias("word"))
    if ascii_only:
        w = w.filter(F.col("word").rlike(_ASCII_WORD))
    return w.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def bpe_pair_counts(
    vocab: DataFrame,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """(pair, n_words, total): adjacent character pairs over the word
    multiset — the statistic a BPE trainer maximizes each merge round.

    `total` = Σ freq(word) · (occurrences of pair in word);
    `n_words` = distinct vocabulary words containing the pair.

    Words shorter than 2 chars carry no pairs and are filtered
    EXPLICITLY — sequence(1, length-1) with length=1 would be
    sequence(1, 0), which Spark evaluates as the DESCENDING [1, 0]
    (step defaults to -1), silently manufacturing a phantom pair.

    The pairs array is materialized in its own projection before the
    explode — exploding the transform(...) expression directly would
    re-evaluate it per output row (the generator trap
    ngram_jaccard_pairs documents with measurements).
    """
    pairs = vocab.filter(F.length(word_col) >= 2).select(
        F.col(word_col).alias("__w"),
        F.col(freq_col).alias("__f"),
        F.expr(
            f"transform(sequence(1, length({word_col}) - 1), "
            f"i -> substring({word_col}, i, 2))"
        ).alias("__ps"),
    )
    # a pair repeated inside one word ("abab" → "ab" twice) counts every
    # occurrence toward `total` but its word only once toward `n_words`
    return (
        pairs.select("__w", "__f", F.explode("__ps").alias("pair"))
        .groupBy("pair")
        .agg(
            F.count_distinct(F.col("__w")).cast("long").alias("n_words"),
            F.sum("__f").cast("long").alias("total"),
        )
    )


def bpe_top_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """Top-k merge candidates: the end-to-end counting pass (corpus →
    word frequencies → pair counts → ordered head). Total order
    (total DESC, pair ASC) so the head is deterministic under ties —
    the repo-wide LIMIT policy (registry.py)."""
    counts = bpe_pair_counts(word_frequencies(docs, text_col))
    return counts.orderBy(F.desc("total"), F.asc("pair")).limit(k)


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    max_vocab_rows: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Full BPE training: the ordered merge list, greedy by pair
    frequency (ties: lexicographically smallest pair — deterministic
    across runs and engines).

    Architecture (the standard one, stated honestly): the CORPUS pass
    is Spark — one word-count shuffle reduces 100 TB to its vocabulary
    — and the merge loop runs DRIVER-SIDE over that vocabulary.
    Heaps' law bounds the vocab at ~10⁵–10⁷ rows regardless of corpus
    size; `max_vocab_rows` ENFORCES the bound before collecting
    (probe with limit(N+1).count(), the same bounded-driver-work
    contract as operators/pq.py's query batches) instead of letting an
    un-tokenizable corpus melt the driver. Every real-world BPE trainer
    (sentencepiece, HF tokenizers) is this same shape: distributed
    count, local loop.

    Merge semantics per Sennrich et al. 2016: words are character
    sequences with no cross-word pairs; each round merges every
    non-overlapping occurrence of the most frequent adjacent symbol
    pair, left to right. Counts are weighted by word frequency. Stops
    early when no pair occurs twice.
    """
    vocab = word_frequencies(docs, text_col)
    if vocab.limit(max_vocab_rows + 1).count() > max_vocab_rows:
        raise ValueError(
            f"vocabulary exceeds max_vocab_rows={max_vocab_rows}; "
            "raise the bound or pre-filter the corpus"
        )
    words: list[tuple[list[str], int]] = [
        (list(r["word"]), r["freq"]) for r in vocab.collect()
    ]

    from collections import Counter, defaultdict

    def pair_counts_of(sym: list[str]):
        # non-overlapping occurrence counting happens at MERGE time;
        # for candidate selection plain adjacent counts are the
        # Sennrich formulation
        return Counter(zip(sym[:-1], sym[1:]))

    counts: Counter = Counter()
    index: defaultdict = defaultdict(set)  # pair -> word ids
    for wid, (sym, freq) in enumerate(words):
        for pr, c in pair_counts_of(sym).items():
            counts[pr] += c * freq
            index[pr].add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for pr, c in counts.items():
            if c >= 2 and (
                best is None
                or c > counts[best]
                or (c == counts[best] and pr < best)
            ):
                best = pr
        if best is None:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for wid in list(index[best]):
            sym, freq = words[wid]
            old = pair_counts_of(sym)
            new_sym: list[str] = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    new_sym.append(joined)
                    i += 2
                else:
                    new_sym.append(sym[i])
                    i += 1
            words[wid] = (new_sym, freq)
            new = pair_counts_of(new_sym)
            for pr in old.keys() | new.keys():
                d = new.get(pr, 0) - old.get(pr, 0)
                if d:
                    counts[pr] += d * freq
                    if counts[pr] <= 0:
                        del counts[pr]
                if new.get(pr, 0):
                    index[pr].add(wid)
                elif pr in index:
                    index[pr].discard(wid)
    return merges
