"""Record linkage: exact edit-distance similarity self-join.

Entity resolution over names/titles needs "all pairs within edit
distance k" — a cross join with levenshtein() at 100 TB is n² and
dead on arrival. The FastSS / SymSpell family makes the join exact
AND equi-joinable: two strings with edit distance <= 1 must share an
element of their deletion neighborhoods ({s} ∪ every single-character
deletion of s). So:

  explode each string into its <= len+1 deletion variants
  -> equi-join on the variant (shuffle keyed on SHORT strings)
  -> distinct candidate pairs
  -> verify with levenshtein (each candidate exactly once)

Candidate volume is Σ len(s) rows — linear in total characters, the
same budget as shingling — and the verify set is tiny because random
strings rarely collide on a deletion variant. No UDFs: the deletion
neighborhood is a JVM-side `transform(sequence(...))` expression.

The k>1 generalization (k-deletion neighborhoods) grows as C(len,k);
this module implements the k=1 case that linkage pipelines use for
blocking, and callers chain it with a verify threshold > 1 only over
the k=1-blocked candidates (documented contract, not a silent cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Exact pairs (id_a < id_b) with levenshtein(text) <= max_dist.

    max_dist must be 1 (the FastSS k=1 neighborhood — see module
    docstring for why larger k is a different size regime).
    Output: (id_a, id_b, dist).
    """
    if max_dist != 1:
        raise ValueError(
            "edit_distance_self_join implements the k=1 deletion "
            "neighborhood; block with k=1 then verify a larger "
            "threshold explicitly if you accept k=1 recall"
        )
    base = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__s")
    )
    # {s} ∪ del1(s): array_union dedups variants (deleting either of a
    # doubled letter yields the same string — one candidate row, not 2)
    variants = base.select(
        "__id",
        "__s",
        F.explode(
            F.array_union(
                F.array(F.col("__s")),
                F.expr(
                    "transform(sequence(1, length(__s)), i -> "
                    "concat(substr(__s, 1, i - 1), substr(__s, i + 1)))"
                ),
            )
        ).alias("__v"),
    )
    a = variants.select(
        F.col("__id").alias("id_a"), F.col("__s").alias("sa"), "__v"
    )
    b = variants.select(
        F.col("__id").alias("id_b"), F.col("__s").alias("sb"), "__v"
    )
    cands = (
        a.join(b, "__v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("sa", "sb"))
        .filter(F.col("dist") <= max_dist)
        .select(
            "id_a", "id_b", F.col("dist").cast("int").alias("dist")
        )
    )
