"""Multi-dimensional data layout (Z-order) for scan pruning.

Parquet/ORC readers skip row groups whose min/max stats exclude the
predicate. Stats only help if values are CLUSTERED: after a plain
write, every file spans the whole value range of every column and
nothing can be skipped. Z-ordering interleaves the bits of several
columns into one sort key so that range-partitioning by the key keeps
files tight in EVERY dimension at once — the layout trick behind
Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain column
expressions (bit arithmetic + repartitionByRange), no table format
required.

At 100 TB this is the difference between "filter on (customer, date)
scans every file" and "scans the handful of files whose stat ranges
intersect" — a read-side win that costs one extra shuffle at write
time. The key is computed JVM-side (shiftleft/bitwise-or chain inside
codegen); the range partitioner samples the key like any other sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_scale_to_int(
    col: Column | str, lo: float, hi: float, bits: int = 16
) -> Column:
    """Scale a numeric column into [0, 2^bits) for bit interleaving.
    `lo`/`hi` come from a one-pass min/max probe (metadata-sized);
    values outside clamp to the edges, NULLs map to 0 (sort first)."""
    c = F.col(col) if isinstance(col, str) else col
    span = float(hi) - float(lo)
    top = (1 << bits) - 1
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = ((c.cast("double") - float(lo)) / span * top).cast("long")
    # coalesce BEFORE the clamp: least/greatest skip NULL operands, so
    # a NULL input would otherwise come out as the top edge, not 0
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(top).cast("long"), F.coalesce(scaled, F.lit(0))),
    ).cast("long")


def zorder_key(ints: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low `bits` of k pre-scaled int columns into one
    long (Morton code): bit b of column i lands at position b*k + i.
    k*bits must fit a signed long (<= 62)."""
    k = len(ints)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(ints):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * k + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int,
    fmt: str = "parquet",
    bits: int = 12,
) -> None:
    """Write `df` range-partitioned + sorted by the Z-order key of
    `cols` into ~`num_files` files.

    Two passes: a metadata-sized min/max probe per column (one agg),
    then the keyed write. Each output file covers a tight hyper-
    rectangle of the value space, so min/max stats prune scans on ANY
    prefix-free combination of the z-ordered columns — unlike
    partitionBy(a).sortBy(b), which only helps queries that lead with
    `a`.
    """
    probes = []
    for c in cols:
        probes += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*probes).collect()[0]
    # an empty frame or an all-NULL column probes to None bounds;
    # degrade that column to a single bucket (0.0/0.0) instead of
    # crashing float(None) before the write even starts
    def _bound(v):
        return 0.0 if v is None else float(v)

    scaled = [
        minmax_scale_to_int(
            F.col(c).cast("double"),
            _bound(row[f"__lo_{c}"]),
            _bound(row[f"__hi_{c}"]),
            bits,
        )
        for c in cols
    ]
    keyed = df.withColumn("__z", zorder_key(scaled, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )


def file_stat_tightness(
    df_with_file: DataFrame, col: str, file_col: str = "__file"
) -> float:
    """Diagnostic: mean per-file (max-min) range of `col` divided by the
    global range — 1.0 means every file spans everything (no pruning
    possible), ~1/num_files means perfect clustering. Used by tests and
    layout audits."""
    per_file = df_with_file.groupBy(file_col).agg(
        (F.max(col) - F.min(col)).alias("w")
    )
    g = df_with_file.agg((F.max(col) - F.min(col)).alias("g")).collect()[0][
        "g"
    ]
    if not g:
        return 0.0
    mean_w = per_file.agg(F.avg("w")).collect()[0][0]
    return float(mean_w) / float(g)


def write_range_partitioned(
    df: DataFrame,
    path: str,
    col: str,
    num_files: int,
    fmt: str = "parquet",
) -> None:
    """Single-dimension clustering twin of `write_zordered`: global
    range-partition + in-file sort on one column, so each output file
    owns a disjoint slice of the value space and min/max footer stats
    prune point/range scans on that column to ~1 file.

    `repartitionByRange` samples the column to build balanced range
    bounds (no explicit min/max probe needed), which also absorbs skew
    better than fixed-width buckets. Use when queries filter on ONE
    dominant column; use Z-order when two or more columns share the
    filter load (range layout on `a` leaves `b` scattered)."""
    (
        df.repartitionByRange(num_files, F.col(col))
        .sortWithinPartitions(col)
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
