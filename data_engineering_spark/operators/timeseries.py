"""Time-series operators Spark lacks as built-ins: as-of join, interval
(range) join, and multi-granularity (hypertable-style) rollup.

These are extension operators (SURVEY.md §2.11 family): the reference
engine has none of them, but any event-time analytics surface needs
them. Each is expressed as a composition of existing DataFrame ops —
no UDFs, no driver loops — so Catalyst/AQE keep optimizing them.

Scale design:

- `asof_join` is the union-window formulation: tag both sides, union,
  one hash-shuffle on the key, one linear window pass carrying the
  most recent right payload forward. No range join, no per-row probe;
  cost is a sort within key partitions — the same profile as any
  windowed aggregation, safe at 100 TB with AQE skew handling.
- `interval_join` requires an equi-key and turns the time bound into a
  post-join filter: Catalyst plans the equi part as a hash/SMJ join
  (never a broadcast-nested-loop cross product).
- `binned_range_join` covers the KEYLESS case (point-in-interval with
  no shared column), which Spark would otherwise plan as a
  broadcast-nested-loop: time is bucketized into fixed bins, intervals
  fan out to every bin they cover, and the join becomes an equi-join
  on the bin with a residual range filter. Each (point, interval) pair
  meets in exactly one bin — the point's — so the output needs no
  dedup pass.
- `hypertable_rollup` computes all granularities in ONE scan and ONE
  shuffle: each row fans out to (grain, truncated-bucket) pairs via a
  generator whose child is a cheap struct of date_truncs (generators
  re-evaluate their child per output row — keep it cheap), then a
  single group-by. A per-grain union would scan the fact table G times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_ts <= left_ts`` (direction='backward'; 'forward' takes the
    smallest ``right_ts >= left_ts``) within the same `on` key — a left
    outer as-of join (unmatched left rows keep NULL right columns).

    Matches DuckDB/pandas ASOF semantics including the tie rule: a right
    row at exactly ``left_ts`` matches. The right side must be unique
    per (key, right_ts) — pre-aggregate if it is not, or which of the
    tied rows wins is undefined (same as DuckDB).

    `tolerance_ms`: optionally reject matches further than this many
    milliseconds from the left timestamp (pandas merge_asof tolerance).

    Implementation: union both sides with a side marker, then one
    window pass per key ordered by (ts, marker) carrying the latest
    right payload struct forward (`last(..., ignorenulls=True)`), with
    the marker sorting right rows before left rows at equal timestamps
    so equality matches. One shuffle on `on`, one sort — no range join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    keys = list(on)
    rcols = [
        c for c in (right_cols or right.columns)
        if c not in keys and c != right_ts
    ]

    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
    )
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__is_l", F.lit(1)
    )
    r_tagged = (
        right.select(*keys, F.col(right_ts).alias("__ts"), payload.alias("__p"))
        .withColumn("__is_l", F.lit(0))
    )
    # SQL equality never matches NULL keys, but Window.partitionBy
    # groups NULLs into ONE partition — without this filter a NULL-key
    # left row would pick up a NULL-key right payload, diverging from
    # the DuckDB/pandas ASOF semantics documented above. Dropping
    # NULL-key right rows leaves NULL-key left rows in an empty
    # partition, i.e. correctly unmatched.
    for k in keys:
        r_tagged = r_tagged.filter(F.col(k).isNotNull())
    # unionByName with missing columns: left rows get NULL __p, right
    # rows get NULL for every left-only column
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    asc = direction == "backward"
    order = [
        F.col("__ts").asc() if asc else F.col("__ts").desc(),
        F.col("__is_l").asc(),  # right rows first at equal ts → ties match
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attached = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))

    out = attached.filter(F.col("__is_l") == 1)
    if tolerance_ms is not None:
        gap = F.abs(
            F.unix_millis(F.col("__ts"))
            - F.unix_millis(F.col("__m").getField("__rts"))
        )
        out = out.withColumn(
            "__m", F.when(gap <= tolerance_ms, F.col("__m"))
        )
    proj = [F.col(c) for c in left.columns]
    proj.append(F.col("__m").getField("__rts").alias(f"{right_ts}_r"))
    proj.extend(F.col("__m").getField(c).alias(c) for c in rcols)
    return out.select(*proj)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose timestamp falls in
    ``[left_ts + lower, left_ts + upper)`` for the same `on` key (a
    banded/range join, e.g. "clicks in the 30 minutes before each
    purchase").

    `lower`/`upper` are interval expressions (``F.expr("INTERVAL -30
    MINUTES")``). The equi-key makes this a hash/sort-merge join with a
    residual range filter — Catalyst never falls back to a nested-loop
    cross product. Right columns keep their names; alias beforehand on
    OUTPUT collisions (the join condition itself qualifies each side,
    so ``left_ts`` and ``right_ts`` may share a name — the natural case
    of two event tables both called 'ts').
    """
    lo = left[left_ts] + lower
    hi = left[left_ts] + upper
    cond = (right[right_ts] >= lo) & (right[right_ts] < hi)
    key_eq = [left[k] == right[k] for k in on]
    joined = left.join(right, key_eq + [cond], how)
    # drop the duplicate right-side key columns
    return joined.drop(*[right[k] for k in on])


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_ms: int = 86_400_000,
    how: str = "inner",
) -> DataFrame:
    """Keyless point-in-interval join, `[start_ts, end_ts)` exclusive
    upper bound, planned as a shuffle equi-join instead of the
    broadcast-nested-loop Spark picks for a bare range predicate.

    Each interval is exploded to the time bins it covers
    (`sequence(floor(start/W), floor((end-1)/W))` — a cheap arithmetic
    generator child); each point carries its single bin; the bin
    equi-join then meets every qualifying pair exactly once (the
    point's bin), so the residual range filter is the only correction
    and no distinct pass exists in the plan.

    Scale: shuffle keys are int64 bins; fanout per interval is
    `len/W + 1` rows of only the interval's columns, so pick
    `bin_width_ms` near the typical interval length (default 1 day).
    Hot bins (many concurrent intervals) are an AQE skew-join case.
    Column names must not collide between the two sides — alias before
    joining.
    """
    w = F.lit(int(bin_width_ms))

    def ms(col: str) -> Column:
        # tolerate timestamp_ntz inputs (parquet TIMESTAMP loads as NTZ);
        # the cast interprets in session tz — binning only needs the
        # same monotonic mapping on both sides, and queries pin UTC
        return F.unix_millis(F.col(col).cast("timestamp"))

    # point-side joins only: the interval side is EXPLODED per bin, so
    # a right/full outer would emit one unmatched copy per bin — an
    # ill-defined result this operator refuses rather than mis-counts
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"binned_range_join supports point-side joins only, got {how!r}"
        )
    pb = points.withColumn("__bin", F.floor(ms(point_ts) / w))
    ib = intervals.filter(F.col(end_ts) > F.col(start_ts)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(ms(start_ts) / w),
                F.floor((ms(end_ts) - 1) / w),
            )
        ),
    )
    # the range predicate rides IN the join condition: as a post-join
    # filter it silently turned every outer join back into an inner one
    # (unmatched rows have NULL bounds, and filter(NULL) drops them)
    # and crashed semi/anti joins, whose output lacks the bound columns
    cond = (
        (pb["__bin"] == ib["__bin"])
        & (pb[point_ts] >= ib[start_ts])
        & (pb[point_ts] < ib[end_ts])
    )
    joined = pb.join(ib, cond, how)
    if how in ("left_semi", "left_anti"):
        return joined.drop("__bin")
    return joined.drop(pb["__bin"]).drop(ib["__bin"])


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    grains: Sequence[str] = ("hour", "day", "month"),
) -> DataFrame:
    """Continuous-aggregate-style rollup at several time granularities
    in one pass: output has a ``grain`` discriminator column and the
    ``bucket_start`` (timestamp_ntz) per grain.

    One scan + one shuffle for ALL grains: rows fan out through a
    generator over a cheap array of (grain, date_trunc) structs, then a
    single group-by on (grain, bucket_start, *keys). The alternative —
    one aggregation per grain unioned — scans the fact table
    len(grains) times; at 100 TB the single-scan plan wins by that
    factor, and the coarser grains add almost nothing to the shuffle
    (their group count is strictly smaller).
    """
    buckets = F.explode(
        F.array(*[
            F.struct(
                F.lit(g).alias("grain"),
                F.date_trunc(g, F.col(ts_col))
                .cast("timestamp_ntz")
                .alias("bucket_start"),
            )
            for g in grains
        ])
    )
    exploded = df.select(buckets.alias("__b"), "*").select(
        F.col("__b.grain").alias("grain"),
        F.col("__b.bucket_start").alias("bucket_start"),
        *df.columns,
    )
    return exploded.groupBy("grain", "bucket_start", *keys).agg(*aggs)
