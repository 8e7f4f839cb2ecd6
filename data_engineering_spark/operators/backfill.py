"""Partition-scoped backfill: re-derive a slice of a derived table.

The orchestration primitive behind "the cleaning logic changed — rerun
March" : read ONLY the affected source partitions, apply the (new)
transformation, and dynamically overwrite exactly those partitions of
the target. Untouched partitions are neither read nor written, so the
cost is proportional to the backfill window, not the table — the same
pruning contract as MergeTable's partitioned merge.

Idempotent by construction (partition overwrite), so a crashed
backfill reruns safely; combine with `sources.incremental.FileLedger`
when the trigger is new files rather than changed logic.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def backfill_partitions(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    partition_col: str,
    partitions: Sequence,
    transform: Callable[[DataFrame], DataFrame],
) -> int:
    """Rebuild `partitions` of the target from the source through
    `transform`. The transform must preserve `partition_col` (checked);
    returns the number of rows written. The source read carries a
    partition-pruning filter, so only the listed partitions' files are
    scanned (visible as PartitionFilters in the plan)."""
    parts = list(partitions)
    if not parts:
        return 0
    src = spark.read.parquet(source_path).filter(
        F.col(partition_col).isin(parts)
    )
    out = transform(src)
    if partition_col not in out.columns:
        raise ValueError(
            f"transform dropped partition column '{partition_col}'"
        )
    # belt over braces: a transform that leaks rows outside the window
    # would silently overwrite partitions the caller didn't ask for
    # (dynamic overwrite replaces whatever partitions appear)
    out = out.filter(F.col(partition_col).isin(parts))
    # the row count and the surviving-partition set ride the WRITE via
    # observe() — a separate count() executed the whole source scan +
    # transform twice, and for a nondeterministic transform counted
    # different rows than were written
    from pyspark.sql import Observation

    obs = Observation()
    out = out.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.collect_set(F.col(partition_col)).alias("parts"),
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
    # dynamic overwrite only replaces partitions PRESENT in the output:
    # a requested partition for which the new transform emits zero rows
    # would silently keep its stale data — exactly when the logic
    # change is most drastic. Delete those directories explicitly
    # (escaped names, NULL partition sentinel included).
    import shutil
    from pathlib import Path

    from data_engineering_spark.operators.merge import _partition_dir

    written = set(obs.get["parts"] or [])
    for stale in set(parts) - written:
        shutil.rmtree(
            Path(target_path) / _partition_dir(partition_col, stale),
            ignore_errors=True,
        )
    return int(obs.get["n"] or 0)
