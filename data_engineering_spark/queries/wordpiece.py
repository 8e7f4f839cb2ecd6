"""WordPiece tokenizer queries (operators/wordpiece.py).

The trained piece list is a model parameter shared through a parquet
fixture (queries/_fixtures.py, keyed by documents row count,
pre-seeded from a DuckDB word count + the same exact-integer
likelihood merge loop wordpiece_train runs). BOTH engines then run
the FULL greedy longest-match segmentation from those parameters —
Spark as one JVM `aggregate` fold over distinct words
(operators/wordpiece.wordpiece_encode_words), DuckDB as a recursive
CTE advancing (rem, toks) one longest-prefix piece per step. The
match is a plain string prefix test in both engines (startsWith /
starts_with — no regex, no collation hazard: same-length candidate
order cannot matter), so the twin is hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (parity imports)

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import query

_MAXL = 32  # WP_MAX_WORD_LEN — inlined into the oracle SQL


def _wp_pieces(spark: SparkSession, sf_dir: str) -> list:
    """The corpus's trained piece list: fixture if seeded (the normal
    path — seed_wordpiece_fixture covers every testdata sf), else
    train via the Spark counting pass and publish to the fixture so
    the oracle sees the same parameters."""
    from data_engineering_spark.operators.wordpiece import (
        wordpiece_train,
    )
    from data_engineering_spark.queries import _fixtures as FX

    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    try:
        FX.seed_wordpiece_fixture()
    except Exception as e:
        FX.warn_fixture_write_failed("seed_wordpiece_fixture", e)
    pieces = FX.read_wordpiece_fixture(n)
    if pieces is None:
        pieces = wordpiece_train(d, num_merges=FX.WP_NUM_MERGES)
        try:
            FX.write_wordpiece_fixture(pieces, n)
        except Exception as e:
            FX.warn_fixture_write_failed("write_wordpiece_fixture", e)
    return pieces


def _wp_oracle_ctes() -> str:
    """CTEs (fx, sarr, carr, wtok, wocc, woc, wdist, seg, enc) — the
    full greedy WordPiece segmentation of every distinct corpus word
    in DuckDB. `seg` is the recursive maximal-munch walk: each step
    consumes the longest candidate piece prefixing `rem` (start
    pieces while toks is empty, continuation pieces after); no match,
    a non-printable-ASCII word, or length > {_MAXL} marks the word
    [UNK]."""
    from data_engineering_spark.queries._fixtures import (
        seed_wordpiece_fixture,
        warn_fixture_write_failed,
        wordpiece_fixture_path,
    )

    try:
        # registration-time pre-seed (idempotent): an oracle-first
        # harness must find the fixture — same convention as BPE/PCA
        seed_wordpiece_fixture()
    except Exception as e:
        warn_fixture_write_failed("seed_wordpiece_fixture", e)
    return f"""
    fx AS (
      SELECT piece FROM read_parquet('{wordpiece_fixture_path()}')
      WHERE corpus_n = (SELECT COUNT(*) FROM documents)),
    sarr AS (
      SELECT list(piece ORDER BY length(piece) DESC, piece) AS a
      FROM fx WHERE NOT starts_with(piece, '##')),
    carr AS (
      SELECT list(substr(piece, 3)
                  ORDER BY length(substr(piece, 3)) DESC,
                           substr(piece, 3)) AS a
      FROM fx WHERE starts_with(piece, '##')),
    wtok AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS t
      FROM documents),
    wocc AS (SELECT doc_id, unnest(t) AS word FROM wtok),
    woc AS (
      SELECT doc_id, word, COUNT(*) AS c FROM wocc GROUP BY 1, 2),
    wdist AS (SELECT DISTINCT word FROM woc),
    seg AS (
      SELECT word, word AS rem, []::VARCHAR[] AS toks,
             (NOT regexp_matches(word, '^[!-~]+$'))
               OR length(word) > {_MAXL} AS bad,
             0 AS depth
      FROM wdist
      UNION ALL
      SELECT word,
             CASE WHEN m IS NULL THEN rem
                  ELSE substr(rem, length(m) + 1) END,
             CASE WHEN m IS NULL THEN toks
                  WHEN len(toks) = 0 THEN list_append(toks, m)
                  ELSE list_append(toks, '##' || m) END,
             m IS NULL,
             depth + 1
      FROM (
        SELECT word, rem, toks, bad, depth,
               list_filter(
                 CASE WHEN len(toks) = 0 THEN (SELECT a FROM sarr)
                      ELSE (SELECT a FROM carr) END,
                 t -> starts_with(rem, t))[1] AS m
        FROM seg
        WHERE rem <> '' AND NOT bad AND depth < {_MAXL})),
    enc AS (
      SELECT word,
             CASE WHEN bad THEN ['[UNK]'] ELSE toks END AS tk,
             CASE WHEN bad THEN 1 ELSE len(toks) END AS n_tok,
             bad AS is_unk
      FROM seg WHERE bad OR rem = '')"""


@query(
    "q_doc_wordpiece_encode",
    oracle=f"""
    WITH RECURSIVE {{ctes}},
    per AS (
      SELECT woc.doc_id,
             SUM(woc.c) AS n_words,
             SUM(woc.c * e.n_tok) AS n_wp_tokens,
             SUM(woc.c * CASE WHEN e.is_unk THEN 1 ELSE 0 END)
               AS n_unk_words
      FROM woc JOIN enc e USING (word) GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(p.n_wp_tokens, 0) AS BIGINT) AS n_wp_tokens,
           CAST(COALESCE(p.n_unk_words, 0) AS BIGINT) AS n_unk_words
    FROM documents d LEFT JOIN per p USING (doc_id)
    """,
)
def q_doc_wordpiece_encode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document WordPiece tokenized length + [UNK] incidence
    under the corpus-trained piece list — the fertility/OOV numbers a
    tokenizer choice is judged by, next to the BPE twin
    (q_doc_bpe_encode). One corpus-sized (doc, word) shuffle; the
    greedy fold runs on distinct words only. Empty docs stay as rows
    with zero counts."""
    from data_engineering_spark.operators.wordpiece import (
        wordpiece_doc_stats,
    )

    d = load_table(spark, sf_dir, "documents")
    return wordpiece_doc_stats(d, _wp_pieces(spark, sf_dir))


@query(
    "q_doc_wordpiece_piece_freq",
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
def q_doc_wordpiece_piece_freq(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-100 WordPiece pieces by corpus occurrence (weighted by
    word frequency) — which subwords actually carry the corpus.
    Total order (total DESC, piece ASC) per the repo LIMIT policy."""
    from data_engineering_spark.operators.wordpiece import (
        wordpiece_piece_freq,
    )

    d = load_table(spark, sf_dir, "documents")
    return wordpiece_piece_freq(d, _wp_pieces(spark, sf_dir), k=100)


def _inline_ctes() -> None:
    """Replace the {ctes} placeholder in this module's registered
    oracles with the shared segmentation CTEs (built once — the
    builder pre-seeds the fixture as a side effect)."""
    from data_engineering_spark.registry import ORACLES

    ctes = _wp_oracle_ctes()
    for name in (
        "q_doc_wordpiece_encode",
        "q_doc_wordpiece_piece_freq",
    ):
        ORACLES[name] = ORACLES[name].format(ctes=ctes)


_inline_ctes()
