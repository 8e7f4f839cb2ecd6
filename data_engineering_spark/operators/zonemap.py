"""Zone maps: file-level min/max statistics + file-skipping reads.

Spark's parquet reader already prunes ROW GROUPS inside each file it
opens, but it still lists and opens every file of a table scan. A zone
map — one metadata row per file with per-column min/max — lets a
predicate skip whole files before the scan starts: the lakehouse
data-skipping primitive (Iceberg manifests / Delta file stats),
re-created on plain parquet.

Scale shape: building the map is one scan aggregating by
`input_file_name()` (output = n_files rows — metadata). Serving a
query collects only the SURVIVING FILE LIST (bounded by file count,
never data) and hands Spark exactly those paths; the residual filter
still runs, so results are exact even when a file's range merely
overlaps the predicate. Pair with `layout.write_range_partitioned` /
`write_zordered`: clustering is what makes the per-file ranges tight
enough to skip.

The map is a plain DataFrame — persist it as parquet next to the table
and refresh it per partition on write, exactly like a manifest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_zonemap(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """One row per data file: (file, n_rows, min_<c>, max_<c> ...)."""
    df = spark.read.parquet(path).withColumn(
        "__file", F.input_file_name()
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("__file").agg(*aggs)


def pruned_read(
    spark: SparkSession,
    path: str,
    zonemap: DataFrame,
    col=None,
    lo=None,
    hi=None,
    ranges: dict | None = None,
) -> tuple[DataFrame, int, int]:
    """Read only the files whose [min,max] ranges intersect the
    predicate, then apply the exact residual filter. Accepts a single
    (col, lo, hi) or `ranges` = {col: (lo, hi), ...} — with several
    predicates a file survives only if EVERY range intersects, so the
    conjunction multiplies the skipping (the Z-order payoff). Returns
    (frame, n_files_read, n_files_total); the collect is over the FILE
    LIST — metadata-sized by construction."""
    if ranges is None:
        ranges = {col: (lo, hi)}
    cols = list(ranges)
    stats = zonemap.select(
        "__file", *[f"min_{c}" for c in cols], *[f"max_{c}" for c in cols]
    ).collect()
    total = len(stats)
    def _intersects(r, c):
        lo_s, hi_s = r[f"min_{c}"], r[f"max_{c}"]
        if lo_s is None or hi_s is None:
            # min/max ignore NULLs, so NULL stats mean the file's
            # column is entirely NULL — a range predicate can never
            # match NULL, so the file prunes (a bare >= against None
            # raised TypeError and killed the read)
            return False
        return hi_s >= ranges[c][0] and lo_s <= ranges[c][1]

    keep = [
        r["__file"]
        for r in stats
        if all(_intersects(r, c) for c in cols)
    ]
    residual = None
    for c, (clo, chi) in ranges.items():
        cond = F.col(c).between(clo, chi)
        residual = cond if residual is None else (residual & cond)
    if not keep:
        return spark.read.parquet(path).limit(0).filter(residual), 0, total
    # basePath keeps hive partition columns reconstructable when the
    # surviving files are addressed directly (a bare leaf-file read
    # loses them, diverging from the keep=[] branch)
    pruned = (
        spark.read.option("basePath", path).parquet(*keep).filter(residual)
    )
    return pruned, len(keep), total
