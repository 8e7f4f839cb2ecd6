"""Record-linkage queries (oracle-checked).

Near-identical names are synthesized deterministically in BOTH
engines (every 7th part name gets its 5th character deleted, appended
as a new record shifted past the key range) so the expected pair set
is exactly known and the oracle can brute-force it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.linkage import (
    edit_distance_self_join,
)
from data_engineering_spark.registry import query


@query(
    "q_part_name_linkage",
    oracle="""
    WITH names AS (
      SELECT p_partkey AS id, p_name AS s FROM part
      UNION ALL
      SELECT p_partkey + 10000000,
             substr(p_name, 1, 4) || substr(p_name, 6)
      FROM part WHERE p_partkey % 7 = 0)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.s, b.s) AS INT) AS dist
    FROM names a JOIN names b
      ON a.id < b.id
     AND abs(length(a.s) - length(b.s)) <= 1
    WHERE levenshtein(a.s, b.s) <= 1
    """,
)
def q_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance<=1 self-join over part names + deterministic
    corruptions (operators/linkage.edit_distance_self_join): FastSS
    deletion-neighborhood blocking makes the join equi-joinable —
    candidate volume linear in total characters — where the oracle
    brute-forces the n² pair space with a length band. levenshtein()
    is the same classic edit distance in both engines."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("s")
    ).unionByName(
        p.filter(F.col("p_partkey") % 7 == 0).select(
            (F.col("p_partkey") + 10000000).alias("id"),
            F.concat(
                F.expr("substr(p_name, 1, 4)"),
                F.expr("substr(p_name, 6)"),
            ).alias("s"),
        )
    )
    return edit_distance_self_join(names, "id", "s", max_dist=1)
