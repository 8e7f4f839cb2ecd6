"""WordPiece tokenizer — likelihood-scored training and greedy
longest-match encoding (Schuster & Nakajima 2012; the BERT tokenizer),
Spark-first.

The two algorithmic differences from BPE (operators/bpe.py):

1. TRAINING picks the pair maximizing the likelihood score
   count(ab) / (count(a) * count(b)) instead of the raw pair count —
   the pair whose merge most improves a unigram LM of the corpus.
   This module compares scores in EXACT INTEGER arithmetic
   (cross-multiplication — no float ratios), so the trainer is
   bit-deterministic and the pure-python fixture seeder reproduces it
   from a DuckDB word count (same contract as bpe_merge_loop).
2. ENCODING is greedy longest-match ("maximal munch"), not merge
   replay: each step consumes the LONGEST vocabulary piece prefixing
   the remaining word, continuation pieces carry the "##" marker, and
   a word with no match at any step (or longer than
   `max_word_len`, or outside the printable-ASCII training alphabet)
   encodes as the single [UNK] token — HuggingFace WordPiece
   semantics.

Scale architecture is the BPE one: the corpus pays ONE word-count
shuffle; training's merge loop runs driver-side over the
Heaps-bounded vocabulary (collected under the same enforced
`max_vocab_rows` probe + auto-doubling `min_freq` floor —
operators/bpe.bounded_vocabulary); encoding runs as a single JVM
`aggregate` fold over the DISTINCT-word side of a word-keyed
aggregation and joins back by word. Zero Python in the distributed
plan. The greedy fold's per-word cost is
O(max_word_len · |pieces|) `startsWith` probes — on distinct words
only, never the corpus.

Cross-engine parity notes (the DuckDB oracle replays the FULL greedy
segmentation as a recursive CTE): piece candidate arrays are sorted
by (length DESC, piece ASC) in both engines; among same-length
candidates order CANNOT matter (two same-length prefixes of one
string are equal), so no collation hazard exists. `startsWith` /
`starts_with` are plain string prefix tests — pieces containing regex
metacharacters are safe.

Beyond-reference surface (the reference engine has no text
operators); same extension family as operators/bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_spark.operators.bpe import (
    _ASCII_WORD,
    bounded_vocabulary,
)
from data_engineering_spark.operators.text import tokens

WP_UNK = "[UNK]"
WP_MAX_WORD_LEN = 32  # HF uses max_input_chars_per_word=100; the
#                       synthetic corpus tops out far below 32, and a
#                       smaller cap keeps the fold short. Longer
#                       words -> [UNK], mirrored in the oracle.


# ---------------------------------------------------------------------------
# Training (driver-side merge loop over the collected vocabulary)
# ---------------------------------------------------------------------------


def wordpiece_merge_loop(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[str]:
    """The driver-side WordPiece merge loop — pure python,
    deterministic, shared verbatim by `wordpiece_train` (fed by the
    Spark word count) and the oracle fixture seeder (fed by a DuckDB
    word count), so both produce IDENTICAL piece lists from identical
    vocabularies.

    Words are symbol sequences [w0, ##w1, ##w2, ...]. Each round
    merges the adjacent pair (a, b) maximizing
    count(ab) / (count(a)·count(b)) over pairs occurring >= 2 times,
    comparing scores by exact cross-multiplication; ties break to the
    higher pair count, then the lexicographically smaller pair.
    Merging keeps the left symbol's form: (a, ##b) -> a##b stripped of
    the interior marker (start form if `a` is a start form).

    Returns the ordered piece list: base start symbols (sorted), base
    continuation symbols (sorted), then each merge's output in merge
    order (first occurrence wins when two merges produce the same
    string — the bpe_vocab_ids dedup rule)."""
    from collections import Counter, defaultdict

    words: list[tuple[list[str], int]] = [
        ([w[0]] + ["##" + c for c in w[1:]], f) for w, f in word_freqs
    ]

    sym_counts: Counter = Counter()
    pair_counts: Counter = Counter()
    index: defaultdict = defaultdict(set)  # pair -> word ids
    for wid, (sym, freq) in enumerate(words):
        for s in sym:
            sym_counts[s] += freq
        for pr, c in Counter(zip(sym[:-1], sym[1:])).items():
            pair_counts[pr] += c * freq
            index[pr].add(wid)

    base_starts = sorted(
        {s for s in sym_counts if not s.startswith("##")}
    )
    base_conts = sorted({s for s in sym_counts if s.startswith("##")})

    merged_pieces: list[str] = []
    for _ in range(num_merges):
        best = None
        for pr, c in pair_counts.items():
            if c < 2:
                continue
            if best is None:
                best = pr
                continue
            bc = pair_counts[best]
            # score(pr) vs score(best): c/(ca*cb) vs bc/(ba*bb),
            # compared exactly as c*ba*bb vs bc*ca*cb (all positive)
            lhs = c * sym_counts[best[0]] * sym_counts[best[1]]
            rhs = bc * sym_counts[pr[0]] * sym_counts[pr[1]]
            if lhs > rhs or (
                lhs == rhs and (c > bc or (c == bc and pr < best))
            ):
                best = pr
        if best is None:
            break
        joined = best[0] + best[1][2:]
        merged_pieces.append(joined)
        for wid in list(index[best]):
            sym, freq = words[wid]
            old_pairs = Counter(zip(sym[:-1], sym[1:]))
            new_sym: list[str] = []
            i = 0
            merged_here = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    new_sym.append(joined)
                    merged_here += 1
                    i += 2
                else:
                    new_sym.append(sym[i])
                    i += 1
            words[wid] = (new_sym, freq)
            if merged_here:
                sym_counts[best[0]] -= merged_here * freq
                sym_counts[best[1]] -= merged_here * freq
                sym_counts[joined] += merged_here * freq
                for s in (best[0], best[1]):
                    if sym_counts[s] <= 0:
                        del sym_counts[s]
            new_pairs = Counter(zip(new_sym[:-1], new_sym[1:]))
            for pr in old_pairs.keys() | new_pairs.keys():
                d = new_pairs.get(pr, 0) - old_pairs.get(pr, 0)
                if d:
                    pair_counts[pr] += d * freq
                    if pair_counts[pr] <= 0:
                        del pair_counts[pr]
                if new_pairs.get(pr, 0):
                    index[pr].add(wid)
                elif pr in index:
                    index[pr].discard(wid)

    pieces: list[str] = []
    seen: set[str] = set()
    for p in base_starts + base_conts + merged_pieces:
        if p not in seen:
            seen.add(p)
            pieces.append(p)
    return pieces


def wordpiece_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    max_vocab_rows: int = 2_000_000,
    min_freq: int = 1,
    max_floor: int = 1 << 20,
) -> list[str]:
    """Full WordPiece training: one Spark word-count shuffle reduces
    the corpus to its vocabulary (bounded collect — see
    operators/bpe.bounded_vocabulary), then the likelihood-scored
    merge loop runs driver-side. Returns the ordered piece list
    (base alphabet as observed in training + merge outputs)."""
    return wordpiece_merge_loop(
        bounded_vocabulary(
            docs, text_col, max_vocab_rows, min_freq, max_floor
        ),
        num_merges,
    )


# ---------------------------------------------------------------------------
# Encoding (greedy longest-match as one JVM fold over distinct words)
# ---------------------------------------------------------------------------


def _candidate_arrays(pieces: list[str]):
    """(starts, conts) sorted by (length DESC, piece ASC): starts are
    the bare start-form pieces, conts the continuation pieces with
    the ## marker STRIPPED (the fold prefixes the marker back when it
    emits the token).

    Every piece must carry at least one content character: an empty
    start piece ("") or bare marker ("##") would prefix-match any
    remainder while consuming NOTHING, and the bounded fold would then
    end with silently truncated tokens instead of an error. Training
    cannot produce one (base symbols are single chars, merges only
    concatenate), but the encode API accepts arbitrary piece lists —
    so the contract is enforced loudly here."""
    bad = [p for p in pieces if p in ("", "##")]
    if bad:
        raise ValueError(
            f"pieces without content characters: {bad!r} — every "
            "piece must consume at least one character per match"
        )
    starts = sorted(
        (p for p in pieces if not p.startswith("##")),
        key=lambda s: (-len(s), s),
    )
    conts = sorted(
        (p[2:] for p in pieces if p.startswith("##")),
        key=lambda s: (-len(s), s),
    )
    return starts, conts


def _str_array(vals: list[str]):
    if not vals:
        return F.array().cast("array<string>")
    return F.array(*[F.lit(v) for v in vals])


def wordpiece_encode_words(
    vocab: DataFrame,
    pieces: list[str],
    word_col: str = "word",
    max_word_len: int = WP_MAX_WORD_LEN,
) -> DataFrame:
    """vocab + (wp_tokens array<string>, n_wp_tokens int, is_unk
    boolean): greedy longest-match WordPiece segmentation of each
    DISTINCT word — one JVM `aggregate` fold, no Python.

    The fold state is (rem, toks, bad); each of `max_word_len` steps
    consumes the longest piece prefixing `rem` (start pieces while
    toks is empty, continuation pieces after) or sets `bad`. A word
    that is non-printable-ASCII, longer than `max_word_len`, or hits
    a no-match step encodes as [[UNK]] with is_unk=true."""
    starts, conts = _candidate_arrays(pieces)
    sarr, carr = _str_array(starts), _str_array(conts)

    def step(acc, _):
        rem, toks, bad = acc["rem"], acc["toks"], acc["bad"]
        cand = F.when(F.size(toks) == 0, sarr).otherwise(carr)
        m = F.try_element_at(
            F.filter(cand, lambda t: rem.startswith(t)), F.lit(1)
        )
        done = bad | (rem == F.lit(""))
        new_rem = F.when(m.isNull(), rem).otherwise(
            rem.substr(F.length(m) + 1, F.length(rem))
        )
        new_toks = F.when(m.isNull(), toks).otherwise(
            F.concat(
                toks,
                F.array(
                    F.when(F.size(toks) == 0, m).otherwise(
                        F.concat(F.lit("##"), m)
                    )
                ),
            )
        )
        return F.when(done, acc).otherwise(
            F.struct(
                new_rem.alias("rem"),
                new_toks.alias("toks"),
                (bad | m.isNull()).alias("bad"),
            )
        )

    eligible = F.col(word_col).rlike(_ASCII_WORD) & (
        F.length(word_col) <= max_word_len
    )
    init = F.struct(
        F.col(word_col).alias("rem"),
        F.array().cast("array<string>").alias("toks"),
        F.lit(False).alias("bad"),
    )
    state = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_word_len)), init, step
    )
    # eligible words (len <= max_word_len) always drain within the
    # fold's max_word_len steps (every non-done step consumes >= 1
    # char or sets bad), so `bad` alone decides UNK
    return (
        vocab.withColumn(
            "__st", F.when(eligible, state)
        )  # skip the fold entirely for ineligible words
        .withColumn("__unk", ~eligible | F.col("__st")["bad"])
        .withColumn(
            "wp_tokens",
            F.when(F.col("__unk"), F.array(F.lit(WP_UNK))).otherwise(
                F.col("__st")["toks"]
            ),
        )
        .withColumn("n_wp_tokens", F.size("wp_tokens"))
        .withColumn("is_unk", F.col("__unk"))
        .drop("__st", "__unk")
    )


def wordpiece_doc_stats(
    docs: DataFrame,
    pieces: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int = WP_MAX_WORD_LEN,
) -> DataFrame:
    """(id_col, n_words, n_wp_tokens, n_unk_words): real WordPiece
    tokenized length and [UNK] incidence of every document — the
    fertility/OOV statistics a tokenizer choice is judged by.

    Plan shape is bpe_doc_token_counts': corpus -> (doc, word, c) one
    fixed-width shuffle; the greedy fold runs on the DISTINCT-word
    side; counts join back on `word` and re-aggregate by document.
    Empty/whitespace docs stay as rows with zero counts."""
    occ = (
        docs.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("word")
        )
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    enc = wordpiece_encode_words(
        occ.select("word").distinct(), pieces, max_word_len=max_word_len
    ).select("word", "n_wp_tokens", "is_unk")
    per_doc = (
        occ.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_words"),
            F.sum(F.col("__c") * F.col("n_wp_tokens"))
            .cast("long")
            .alias("n_wp_tokens"),
            F.sum(
                F.col("__c") * F.col("is_unk").cast("long")
            )
            .cast("long")
            .alias("n_unk_words"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_wp_tokens", F.lit(0)).alias("n_wp_tokens"),
            F.coalesce("n_unk_words", F.lit(0)).alias("n_unk_words"),
        )
    )


def wordpiece_piece_freq(
    docs: DataFrame,
    pieces: list[str],
    text_col: str = "text",
    k: int = 100,
    max_word_len: int = WP_MAX_WORD_LEN,
) -> DataFrame:
    """Top-k (piece, n_words, total) over the corpus token multiset
    under the trained pieces — which subwords actually carry the
    corpus ("tokenizer fertility" analysis). `total` is weighted by
    word frequency; `n_words` counts distinct vocabulary words
    emitting the piece. Total order (total DESC, piece ASC)."""
    wf = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    enc = wordpiece_encode_words(
        wf, pieces, max_word_len=max_word_len
    ).select("word", "freq", "wp_tokens")
    # explode_OUTER, deliberately: a plain explode makes the optimizer
    # infer `size(wp_tokens) > 0` (InferFiltersFromGenerate), and
    # because wp_tokens is a function of the grouping column alone,
    # PushDownPredicates legally sinks that filter BELOW the word
    # aggregation — the whole greedy fold then re-evaluates once per
    # CORPUS OCCURRENCE instead of once per distinct word (measured
    # 41 s vs 3 s at sf0.1; linear in corpus, alpha 1.0 at x16). No
    # inferred filter exists for outer generates, and the arrays are
    # never empty (every word encodes to >= 1 token, [UNK] at worst),
    # so the outer variant is semantically identical.
    return (
        enc.select(
            "word", "freq", F.explode_outer("wp_tokens").alias("piece")
        )
        .groupBy("piece")
        .agg(
            F.count_distinct("word").cast("long").alias("n_words"),
            F.sum("freq").cast("long").alias("total"),
        )
        .orderBy(F.desc("total"), F.asc("piece"))
        .limit(k)
    )
