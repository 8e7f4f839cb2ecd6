"""Slowly-changing-dimension (Type 2) maintenance over a change stream.

The reference's CDC pipeline keeps only the LATEST row per key (LWW
MERGE, /root/reference/incremental_kafka_s3_cdc.py:243-292) — the
Type 1 answer. Warehouses also need the Type 2 answer: the full history
of each key's attribute values as validity intervals
(valid_from, valid_to, is_current), so facts can join the dimension
AS OF their own event time.

Everything here is declarative window algebra — one shuffle on the
dimension key per build, no UDFs, no driver loops:

  build:   order changes per key -> suppress no-op changes (value equal
           to the previous change, NULL-safe) -> valid_to = lead(ts).
  merge:   incremental maintenance that never rescans closed history —
           only the CURRENT rows of keys touched by the delta are
           reopened (as a pseudo-change at their valid_from) and
           rebuilt together with the delta. Equivalence to a full
           rebuild holds because change suppression only ever looks at
           the IMMEDIATELY PREVIOUS value, which for the first delta
           change is exactly the reopened current row.
  as_of:   point-in-time slice: valid_from <= t < valid_to.

At 100 TB the delta is hours of changes and the dimension's current
set is one row per live key; `scd2_merge` shuffles only those two —
closed history (the bulk of the table) is untouched, which is the
property that makes nightly SCD2 maintenance feasible at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order(ts_col: str, order_cols: list[str] | None) -> list[Column]:
    return [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]


def scd2_build(
    changes: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Change stream -> SCD2 history.

    Output: keys + tracked + (valid_from, valid_to, is_current,
    version). `valid_to` is NULL on the current row. `order_cols`
    break ordering ties within a key at equal `ts_col` (pass a unique
    id for a total order — same rule as registry.py's top-k policy).

    Consecutive changes with identical tracked values (NULL-safe,
    field-wise) are suppressed: they extend the existing interval
    instead of opening a new version — the standard SCD2 no-op rule.
    """
    w = Window.partitionBy(*keys).orderBy(*_order(ts_col, order_cols))
    cur = F.struct(*[F.col(c) for c in tracked])
    suppressed = (
        changes.withColumn("__rn", F.row_number().over(w))
        .withColumn("__prev", F.lag(cur).over(w))
        .filter((F.col("__rn") == 1) | ~cur.eqNullSafe(F.col("__prev")))
        .drop("__rn", "__prev")
    )
    # windows over the FILTERED frame: lead skips suppressed rows, so
    # intervals chain across them. Same partitioning as `w` -> Catalyst
    # reuses one exchange for both window stages.
    w2 = Window.partitionBy(*keys).orderBy(*_order(ts_col, order_cols))
    return suppressed.select(
        *keys,
        *tracked,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        # version ordered by the SAME total order as the intervals —
        # deterministic even if two versions open at an equal timestamp
        F.row_number().over(w2).cast("int").alias("version"),
    ).select(
        *keys,
        *tracked,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        "version",
    )


def scd2_merge(
    dim: DataFrame,
    delta: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Incrementally apply a change delta to an existing SCD2 table.

    `dim` must be a prior `scd2_build`/`scd2_merge` output; `delta`
    carries keys + tracked + ts (+ order_cols). Delta changes must not
    predate the current row's `valid_from` of their key (CDC streams
    are time-ordered; violating rows would rewrite closed history,
    which SCD2 defines away).

    Plan shape: closed rows pass through untouched (no shuffle beyond
    the final union); current rows of touched keys are reopened as a
    pseudo-change and rebuilt with the delta — one window build over
    |touched current| + |delta| rows.
    """
    closed = dim.filter(~F.col("is_current")).select(
        *keys, *tracked, "valid_from", "valid_to", "is_current"
    )
    current = dim.filter(F.col("is_current"))
    touched = delta.select(*keys).distinct()
    untouched_current = current.join(touched, keys, "left_anti").select(
        *keys, *tracked, "valid_from", "valid_to", "is_current"
    )
    # reopen: the current row becomes a change at its own valid_from.
    # __seq=0 sorts it before any delta change at the same timestamp;
    # order_cols of the pseudo-row are NULL and never compared because
    # __seq already breaks the tie.
    # the pseudo-row's NULL order cols take the DELTA's own types —
    # force-casting the delta side to long would corrupt string or
    # sub-second-timestamp tiebreakers (NULLs / truncation = false
    # ties, breaking the rebuild-equivalence contract)
    pseudo = current.join(touched, keys, "left_semi").select(
        *keys,
        *tracked,
        F.col("valid_from").alias(ts_col),
        F.lit(0).alias("__seq"),
        *[
            F.lit(None).cast(delta.schema[c].dataType).alias(c)
            for c in (order_cols or [])
        ],
    )
    d = delta.select(
        *keys,
        *tracked,
        ts_col,
        F.lit(1).alias("__seq"),
        *[F.col(c) for c in (order_cols or [])],
    )
    rebuilt = scd2_build(
        pseudo.unionByName(d),
        keys,
        tracked,
        ts_col,
        order_cols=["__seq"] + list(order_cols or []),
    ).select(*keys, *tracked, "valid_from", "valid_to", "is_current")
    merged = closed.unionByName(untouched_current).unionByName(rebuilt)
    # version is a property of the whole history; recompute it over the
    # merged dimension (dimension-sized window, not fact-sized)
    return merged.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy(*keys).orderBy(
                "valid_from", F.asc_nulls_last("valid_to")
            )
        )
        .cast("int")
        .alias("version"),
    )


def scd2_as_of(dim: DataFrame, at: Column | str) -> DataFrame:
    """Point-in-time slice: the one version per key valid at `at`
    (valid_from <= at < valid_to, open-ended current rows included).
    A partition- and file-prunable filter — no shuffle."""
    t = F.lit(at).cast("timestamp") if isinstance(at, str) else at
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
