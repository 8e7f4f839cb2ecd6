"""Scale-safe global sequence numbers (surrogate-key assignment).

The naive way to number rows 1..N in a total order is
``row_number() OVER (ORDER BY ...)`` with no partition — Spark moves
the ENTIRE table into one task (WindowExec warns exactly this). The
distributed-classic alternative implemented here:

1. range-repartition + in-partition sort on the order columns, so
   partition p holds a contiguous, sorted slice of the total order;
2. count rows per partition (a metadata-sized aggregate — P longs);
3. cumulative-sum those counts on the driver into per-partition start
   offsets, broadcast them back;
4. ``seq_id = offset[p] + row_number() within p`` — the within-
   partition window never crosses executors.

Total cost: the one range shuffle you cannot avoid for a total order,
plus a count pass over the cached sorted frame. No single-task stage,
no driver materialization of data rows.

Determinism requires the order columns to form a unique key (otherwise
ties make ANY engine's numbering arbitrary); callers append a
tiebreaker column as the last order column, same as the top-k queries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sequential_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    id_col: str = "seq_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """See module docstring. The sorted frame is persisted so the
    count pass and the numbering pass observe identical sampled range
    bounds; ``result.unpersist()`` would NOT release it (the persist
    lives on an internal frame, not the returned one) — callers that
    are done with the result release it via
    ``release_sequential_ids(result)`` (same cache-lifetime contract
    as the near-dup operators' release_cache)."""
    cols = [F.col(c) for c in order_cols]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # cache so the count pass and the numbering pass see the SAME
    # sampled range bounds / partition ids (repartitionByRange samples;
    # recomputing it in two independent jobs could draw different cuts)
    sorted_df = sorted_df.persist()
    counts = {
        r["__pid"]: r["n"]
        for r in sorted_df.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    off = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    out = (
        sorted_df.join(F.broadcast(off), "__pid")
        .withColumn(
            id_col, (F.col("__off") + F.row_number().over(w)).cast("long")
        )
        .drop("__pid", "__off")
    )
    # stash the persisted handle on the result so callers can release
    # the cache this function pinned (out.unpersist() cannot reach it)
    out.__dict__["_seq_persisted"] = sorted_df
    return out


def release_sequential_ids(df) -> None:
    """Release the cache `assign_sequential_ids` pinned for `df`.
    No-op for frames that did not come from it."""
    src = df.__dict__.get("_seq_persisted")
    if src is not None:
        src.unpersist(blocking=False)
