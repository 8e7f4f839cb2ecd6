"""Eval-set decontamination queries (operators/decontaminate.py).

The eval "benchmark" is a deterministic corpus slice (doc_id % 97 =
0) — self-contained in the testdata, and it guarantees non-trivial
output (every eval doc is in the corpus, so at minimum the slice
itself and its exact/near duplicates flag as contaminated). The gram
match is on the literal n-gram string, so the DuckDB twin replays the
ENTIRE pipeline — tokenize, shingle, eval-set distinct, overlap
counts — hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.registry import query

_N = 6  # gram length (GPT-3 used 13 on web-scale text; the synthetic
#         docs are shorter, 6 keeps the overlap structure non-trivial)
_EVAL_MOD = 97

_DECON_CTE = f"""
    tok AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS t
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= {_N}
                  THEN list_distinct(list_transform(
                         range(1, len(t) - {_N - 2}),
                         i -> array_to_string(t[i:i+{_N - 1}], ' ')))
                  ELSE [] END AS s
      FROM tok),
    eg AS (
      SELECT DISTINCT unnest(s) AS g FROM sh
      WHERE doc_id % {_EVAL_MOD} = 0),
    inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
    hits AS (
      SELECT i.doc_id, COUNT(*) AS nc
      FROM inv i JOIN eg ON i.g = eg.g GROUP BY 1),
    decon AS (
      SELECT b.doc_id, CAST(len(b.s) AS BIGINT) AS n_grams,
             CAST(COALESCE(h.nc, 0) AS BIGINT) AS n_contaminated,
             COALESCE(h.nc, 0) > 0 AS contaminated
      FROM sh b LEFT JOIN hits h USING (doc_id))
"""


def _eval_slice(d: DataFrame) -> DataFrame:
    return d.filter(F.pmod("doc_id", F.lit(_EVAL_MOD)) == 0)


@query(
    "q_doc_decontamination_stats",
    oracle=f"""
    WITH {_DECON_CTE}
    SELECT doc_id, n_grams, n_contaminated, contaminated FROM decon
    """,
)
def q_doc_decontamination_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document eval-set contamination accounting (the GPT-3-style
    n-gram overlap check): distinct n-gram (n=6) count, how many appear in
    the benchmark slice, and the flag. One corpus scan + a broadcast
    of the bounded eval gram set — the 100 TB shape is identical
    (operators/decontaminate.py module docstring)."""
    d = load_table(spark, sf_dir, "documents")
    from data_engineering_spark.operators.decontaminate import (
        contamination_stats,
    )

    return contamination_stats(d, _eval_slice(d), n=_N)


@query(
    "q_doc_decontaminated",
    oracle=f"""
    WITH {_DECON_CTE}
    SELECT d.doc_id, d.source, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d JOIN decon USING (doc_id)
    WHERE NOT decon.contaminated
    """,
)
def q_doc_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned training corpus: documents sharing any 6-gram with
    the benchmark slice dropped (which removes the slice itself plus
    its exact/near duplicates — exactly the memorization channel the
    step exists to close)."""
    d = load_table(spark, sf_dir, "documents")
    from data_engineering_spark.operators.decontaminate import (
        decontaminate,
    )

    return decontaminate(d, _eval_slice(d), n=_N).select(
        "doc_id", "source", "lang", F.col("n_chars").cast("long")
    )
