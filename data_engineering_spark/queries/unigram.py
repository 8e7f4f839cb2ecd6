"""Unigram-LM (SentencePiece) tokenizer queries
(operators/unigram.py) — the third tokenizer family next to BPE and
WordPiece.

The trained model is (piece, score) rows shared through a parquet
fixture (queries/_fixtures.py, keyed by documents row count,
pre-seeded from a DuckDB word count + the same pure-python EM loop
unigram_train runs). Scores are log-probabilities quantized to
INTEGER nano-nats at training time, so although EM itself is float
arithmetic (the documented no-hash tail of this family), everything
downstream of the published model is exact int64: BOTH engines run
the full Viterbi DP from those integer scores — Spark as one JVM
`aggregate` fold over distinct words
(operators/unigram.unigram_encode_words), DuckDB as a recursive CTE
carrying the (best, back) DP arrays — and per-document score sums are
exact integer aggregates. Tie-break at every DP cell is the
struct-lexicographic max of (score, piece_length) in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (parity imports)

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import query

_MAXL = 32  # UG_MAX_WORD_LEN — inlined into the oracle SQL


def _ug_scores(spark: SparkSession, sf_dir: str) -> list:
    """The corpus's trained (piece, score) model: fixture if seeded
    (the normal path — seed_unigram_fixture covers every testdata sf),
    else train via the Spark counting pass and publish to the fixture
    so the oracle sees the same parameters."""
    from data_engineering_spark.operators.unigram import unigram_train
    from data_engineering_spark.queries import _fixtures as FX

    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    try:
        FX.seed_unigram_fixture()
    except Exception as e:
        FX.warn_fixture_write_failed("seed_unigram_fixture", e)
    scores = FX.read_unigram_fixture(n)
    if scores is None:
        scores = unigram_train(
            d,
            vocab_size=FX.UG_VOCAB_SIZE,
            max_piece_len=FX.UG_MAX_PIECE_LEN,
        )
        try:
            FX.write_unigram_fixture(scores, n)
        except Exception as e:
            FX.warn_fixture_write_failed("write_unigram_fixture", e)
    return scores


def _ug_oracle_ctes() -> str:
    """CTEs (fxu, mp, wtok, wocc, woc, wdist, vit, vfin, rec, enc) —
    the full integer Viterbi segmentation of every distinct corpus
    word in DuckDB. `vit` fills the DP left to right, one position per
    recursion step, carrying the (best, back) arrays and the broadcast
    score map as row columns (subqueries are illegal inside DuckDB
    lambdas, so the map rides the rows — vocabulary-sized, tiny).
    `rec` walks the backpointers; a non-printable-ASCII word, one
    longer than {_MAXL}, or one with an unreachable final position
    encodes as ['[UNK]'] with a NULL score."""
    from data_engineering_spark.queries._fixtures import (
        seed_unigram_fixture,
        unigram_fixture_path,
        warn_fixture_write_failed,
    )

    try:
        seed_unigram_fixture()
    except Exception as e:
        warn_fixture_write_failed("seed_unigram_fixture", e)
    return f"""
    fxu AS (
      SELECT piece, score
      FROM read_parquet('{unigram_fixture_path()}')
      WHERE corpus_n = (SELECT COUNT(*) FROM documents)),
    mp AS (
      SELECT map(list(piece ORDER BY piece),
                 list(score ORDER BY piece)) AS mm,
             MAX(length(piece)) AS maxp
      FROM fxu),
    wtok AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS t
      FROM documents),
    wocc AS (SELECT doc_id, unnest(t) AS word FROM wtok),
    woc AS (
      SELECT doc_id, word, COUNT(*) AS c FROM wocc GROUP BY 1, 2),
    wdist AS (SELECT DISTINCT word FROM woc),
    vit AS (
      SELECT word, 0 AS i,
             [CAST(0 AS BIGINT)] AS best,
             [CAST(0 AS BIGINT)] AS back,
             (SELECT mm FROM mp) AS mm,
             (SELECT maxp FROM mp) AS maxp,
             (NOT regexp_matches(word, '^[!-~]+$'))
               OR length(word) > {_MAXL} AS bad
      FROM wdist
      UNION ALL
      SELECT word, i + 1,
             list_append(best, pk.s), list_append(back, pk.l),
             mm, maxp, bad
      FROM (
        SELECT word, i, best, back, mm, maxp, bad,
               list_max(list_filter(
                 list_transform(
                   range(1, least(i + 1, maxp) + 1),
                   l -> {{'s': best[i + 2 - l]
                              + (mm[substr(word, i + 2 - l, l)])[1],
                         'l': l}}),
                 c -> c.s IS NOT NULL)) AS pk
        FROM vit WHERE NOT bad AND i < length(word))),
    vfin AS (
      SELECT word, back, bad, best[length(word) + 1] AS sc
      FROM vit
      WHERE i = CASE WHEN bad THEN 0 ELSE length(word) END),
    rec AS (
      SELECT word,
             CASE WHEN bad OR sc IS NULL THEN 0
                  ELSE length(word) END AS pos,
             []::VARCHAR[] AS toks, back,
             bad OR sc IS NULL AS unk, sc
      FROM vfin
      UNION ALL
      SELECT word, pos - back[pos + 1],
             list_prepend(
               substr(word, pos - back[pos + 1] + 1, back[pos + 1]),
               toks),
             back, unk, sc
      FROM rec WHERE pos > 0),
    enc AS (
      SELECT word,
             CASE WHEN unk THEN ['[UNK]'] ELSE toks END AS tk,
             CASE WHEN unk THEN 1 ELSE len(toks) END AS n_tok,
             unk AS is_unk,
             CASE WHEN unk THEN NULL ELSE sc END AS score
      FROM rec WHERE pos = 0)"""


@query(
    "q_doc_unigram_encode",
    oracle=f"""
    WITH RECURSIVE {{ctes}},
    per AS (
      SELECT woc.doc_id,
             SUM(woc.c) AS n_words,
             SUM(woc.c * e.n_tok) AS n_ug_tokens,
             SUM(woc.c * CASE WHEN e.is_unk THEN 1 ELSE 0 END)
               AS n_unk_words,
             SUM(woc.c * e.score) AS ssum
      FROM woc JOIN enc e USING (word) GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(p.n_ug_tokens, 0) AS BIGINT) AS n_ug_tokens,
           CAST(COALESCE(p.n_unk_words, 0) AS BIGINT) AS n_unk_words,
           CAST(COALESCE(p.ssum, 0) AS BIGINT) AS ug_score_sum
    FROM documents d LEFT JOIN per p USING (doc_id)
    """,
)
def q_doc_unigram_encode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document unigram-LM tokenized length, [UNK] incidence, and
    exact integer Viterbi score mass under the corpus-trained model —
    the SentencePiece fertility/likelihood numbers next to the BPE and
    WordPiece twins. One corpus-sized (doc, word) shuffle; the Viterbi
    fold runs on distinct words only. Empty docs stay as rows with
    zero counts."""
    from data_engineering_spark.operators.unigram import (
        unigram_doc_stats,
    )

    d = load_table(spark, sf_dir, "documents")
    return unigram_doc_stats(d, _ug_scores(spark, sf_dir))


@query(
    "q_doc_unigram_piece_freq",
    oracle=f"""
    WITH RECURSIVE {{ctes}},
    wf AS (SELECT word, COUNT(*) AS freq FROM wocc GROUP BY 1),
    px AS (
      SELECT wf.word, wf.freq, unnest(e.tk) AS piece
      FROM wf JOIN enc e USING (word))
    SELECT piece,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words,
           CAST(SUM(freq) AS BIGINT) AS total
    FROM px GROUP BY 1
    ORDER BY total DESC, piece ASC LIMIT 100
    """,
)
def q_doc_unigram_piece_freq(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-100 unigram-LM pieces by corpus occurrence (weighted by
    word frequency) — which subwords the EM-fitted model actually uses
    to carry the corpus. Total order (total DESC, piece ASC)."""
    from data_engineering_spark.operators.unigram import (
        unigram_piece_freq,
    )

    d = load_table(spark, sf_dir, "documents")
    return unigram_piece_freq(d, _ug_scores(spark, sf_dir), k=100)


@query(
    "q_doc_unigram_token_ids",
    oracle=f"""
    WITH RECURSIVE {{ctes}},
    uid AS (
      SELECT piece, ROW_NUMBER() OVER (ORDER BY piece) AS tid
      FROM fxu),
    iw AS (
      SELECT doc_id, generate_subscripts(t, 1) - 1 AS wpos,
             unnest(t) AS word
      FROM wtok),
    itk AS (
      SELECT iw.doc_id, iw.wpos,
             generate_subscripts(e.tk, 1) - 1 AS tpos,
             unnest(e.tk) AS tok
      FROM iw JOIN enc e USING (word))
    SELECT t.doc_id, CAST(t.wpos AS INT) AS wpos,
           CAST(t.tpos AS INT) AS tpos,
           CAST(COALESCE(u.tid, 0) AS INT) AS token_id
    FROM itk t LEFT JOIN uid u ON u.piece = t.tok
    """,
)
def q_doc_unigram_token_ids(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Viterbi-tokenized corpus as an integer-id stream — the
    unigram twin of q_doc_bpe_token_ids: ids are a pure function of
    the fixture-shared model ([UNK]=0, pieces 1.. in piece order),
    (wpos, tpos) gives a deterministic within-document order without a
    global sequence window. DuckDB replays the full Viterbi AND the id
    assignment."""
    from data_engineering_spark.operators.unigram import (
        unigram_encode_ids,
    )

    d = load_table(spark, sf_dir, "documents")
    return unigram_encode_ids(d, _ug_scores(spark, sf_dir))


@query(
    "q_doc_unigram_pack_bins",
    oracle=f"""
    WITH RECURSIVE {{ctes}},
    per AS (
      SELECT d.doc_id, d.lang, d.source,
             CAST(COALESCE(SUM(woc.c * e.n_tok), 0) AS BIGINT)
               AS n_ug_tokens
      FROM documents d
      LEFT JOIN woc ON woc.doc_id = d.doc_id
      LEFT JOIN enc e ON e.word = woc.word
      GROUP BY 1, 2, 3),
    wl AS (
      SELECT lang, source, doc_id, n_ug_tokens,
             COALESCE(SUM(n_ug_tokens) OVER (
               PARTITION BY lang, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) // 2048 AS pack_id
      FROM per)
    SELECT lang, source, CAST(pack_id AS INT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_ug_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc
    FROM wl GROUP BY 1, 2, 3
    """,
)
def q_doc_unigram_pack_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequence packing driven by REAL unigram-LM token counts —
    parity with q_doc_bpe_pack_bins on the third tokenizer: documents
    packed into 2048-token training bins per (lang, source) shard,
    greedy running-total assignment (operators/text.pack_chunks) over
    the Viterbi encode output. Per-shard windows, so no partition
    grows with corpus-per-language."""
    from data_engineering_spark.operators.text import pack_chunks
    from data_engineering_spark.operators.unigram import (
        unigram_doc_stats,
    )

    d = load_table(spark, sf_dir, "documents")
    counts = unigram_doc_stats(d, _ug_scores(spark, sf_dir)).select(
        "doc_id", "n_ug_tokens"
    )
    per_doc = d.select("doc_id", "lang", "source").join(
        counts, "doc_id"
    )
    packed = pack_chunks(
        per_doc,
        budget_tokens=2048,
        partition_cols=("lang", "source"),
        order_cols=("doc_id",),
        tokens_col="n_ug_tokens",
    )
    return packed.groupBy("lang", "source", "pack_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_ug_tokens").cast("bigint").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


def _inline_ctes() -> None:
    """Replace the {ctes} placeholder in this module's registered
    oracles with the shared Viterbi CTEs (built once — the builder
    pre-seeds the fixture as a side effect)."""
    from data_engineering_spark.registry import ORACLES

    ctes = _ug_oracle_ctes()
    for name in (
        "q_doc_unigram_encode",
        "q_doc_unigram_piece_freq",
        "q_doc_unigram_token_ids",
        "q_doc_unigram_pack_bins",
    ):
        ORACLES[name] = ORACLES[name].format(ctes=ctes)


_inline_ctes()


# ---------------------------------------------------------------------------
# Tokenizer-family comparison (VERDICT r9 #7): the table a
# training-data owner reads when choosing a tokenizer.
# ---------------------------------------------------------------------------


def _compare_oracle() -> str:
    """One row per family (bpe / wordpiece / unigram): corpus word
    occurrences, tokenized length, [UNK] occurrences, fertility and
    UNK rate. Each family's fold CTEs are scoped inside a derived
    table (their names collide across builders); n_words must agree
    across the three rows — a built-in cross-check."""
    from data_engineering_spark.operators.bpe import BPE_SENTINEL as _S
    from data_engineering_spark.queries.classifier import (
        _bpe_oracle_cte,
    )
    from data_engineering_spark.queries.wordpiece import (
        _wp_oracle_ctes,
    )

    return f"""
    WITH fam AS (
      SELECT 'bpe' AS family, COUNT(*) AS n_words,
             SUM(CASE WHEN s IS NULL THEN 1
                 ELSE (length(s) - length(replace(s, '{_S}', ''))) // 2
                 END) AS n_tokens,
             SUM(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS n_unk_words
      FROM (WITH {_bpe_oracle_cte()} SELECT s FROM seg)
      UNION ALL
      SELECT 'wordpiece', SUM(c), SUM(c * n_tok),
             SUM(c * CASE WHEN is_unk THEN 1 ELSE 0 END)
      FROM (WITH RECURSIVE {_wp_oracle_ctes()}
            SELECT woc.c, e.n_tok, e.is_unk
            FROM woc JOIN enc e USING (word))
      UNION ALL
      SELECT 'unigram', SUM(c), SUM(c * n_tok),
             SUM(c * CASE WHEN is_unk THEN 1 ELSE 0 END)
      FROM (WITH RECURSIVE {_ug_oracle_ctes()}
            SELECT woc.c, e.n_tok, e.is_unk
            FROM woc JOIN enc e USING (word)))
    SELECT family, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_unk_words AS BIGINT) AS n_unk_words,
           CASE WHEN n_words = 0 THEN 0.0
                ELSE ROUND(CAST(n_tokens AS DOUBLE) / n_words, 6)
           END AS fertility_r,
           CASE WHEN n_words = 0 THEN 0.0
                ELSE ROUND(CAST(n_unk_words AS DOUBLE) / n_words, 6)
           END AS unk_rate_r
    FROM fam
    """


@query("q_doc_tokenizer_compare", oracle=_compare_oracle())
def q_doc_tokenizer_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus fertility / tokens-per-word / UNK rate for all three
    trained tokenizer families in ONE corpus scan: one (word, count)
    aggregation, then the three encode folds run on the DISTINCT-word
    vocabulary only (Heaps-bounded however large the corpus) and join
    back by word. n_words is identical across the three rows by
    construction — a visible cross-check. The two rates are single
    IEEE divisions of exact integers, rounded at 1e-6 (policy-safe)."""
    from data_engineering_spark.operators.bpe import bpe_encode_words
    from data_engineering_spark.operators.text import tokens
    from data_engineering_spark.operators.unigram import (
        unigram_encode_words,
    )
    from data_engineering_spark.operators.wordpiece import (
        wordpiece_encode_words,
    )
    from data_engineering_spark.queries.classifier import _bpe_merges
    from data_engineering_spark.queries.wordpiece import _wp_pieces

    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = wc.select("word")

    bpe = bpe_encode_words(vocab, _bpe_merges(spark, sf_dir)).select(
        "word",
        F.col("n_bpe_tokens").alias("n_tok"),
        (~F.col("word").rlike("^[!-~]+$")).alias("is_unk"),
    )
    wp = wordpiece_encode_words(
        vocab, _wp_pieces(spark, sf_dir)
    ).select("word", F.col("n_wp_tokens").alias("n_tok"), "is_unk")
    ug = unigram_encode_words(
        vocab, _ug_scores(spark, sf_dir)
    ).select("word", F.col("n_ug_tokens").alias("n_tok"), "is_unk")

    def fam(name: str, enc: DataFrame) -> DataFrame:
        j = wc.join(enc, "word")
        return j.agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_tok"))
            .cast("long")
            .alias("n_tokens"),
            F.sum(
                F.when(F.col("is_unk"), F.col("c")).otherwise(0)
            )
            .cast("long")
            .alias("n_unk_words"),
        ).select(
            F.lit(name).alias("family"),
            "n_words",
            "n_tokens",
            "n_unk_words",
        )

    out = (
        fam("bpe", bpe)
        .unionByName(fam("wordpiece", wp))
        .unionByName(fam("unigram", ug))
    )
    rate = lambda num: F.when(  # noqa: E731
        F.col("n_words") == 0, F.lit(0.0)
    ).otherwise(
        F.round(num.cast("double") / F.col("n_words"), 6)
    )
    return out.select(
        "family",
        "n_words",
        "n_tokens",
        "n_unk_words",
        rate(F.col("n_tokens")).alias("fertility_r"),
        rate(F.col("n_unk_words")).alias("unk_rate_r"),
    )
