"""Watermarked stream-stream joins (beyond-parity streaming surface).

The reference never joins two streams (SURVEY §2.9: its only stateful
concern is checkpointed offsets); at 100 TB-scale event pipelines the
canonical missing piece is event-to-event attribution — clicks joined
to the impressions that preceded them within a bounded window. Spark's
stream-stream join is exactly that, PROVIDED both sides carry
watermarks and the join condition bounds event-time distance; without
the bound the join state grows forever (Spark refuses outer joins and
keeps inner-join state indefinitely). This module packages the
correct-by-construction shape:

- both inputs watermarked (state eviction is driven by the slower
  side's watermark + the interval bound);
- the time bound expressed as ``right.ts BETWEEN left.ts + lower AND
  left.ts + upper`` — the form Spark's state-cleanup planner
  recognizes (SPARK docs: "time range condition");
- equality keys joined by column name so neither side's key column is
  duplicated in the output.

State size: O(events inside the watermark+interval horizon) per key —
independent of stream length, which is what makes the operator safe on
an unbounded 100 TB/day firehose. At rest the same call works on batch
frames (watermarks are a no-op), so batch backfill and the streaming
path share one definition — tested equivalent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def watermarked_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two (possibly streaming) event frames on ``keys`` where
    ``right_ts`` lands in ``[left_ts + lower, left_ts + upper]``.

    ``lower``/``upper``/watermarks are Spark interval strings. For
    outer joins Spark additionally requires the watermark + time bound
    (it cannot emit "no match" until the horizon passes); this wrapper
    applies watermarks unconditionally so every ``how`` is legal.
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct column names: the "
            f"joined output needs both ({left_ts!r})"
        )
    if not keys:
        raise ValueError("stream-stream joins need at least one key")
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    bound: Column = (
        F.col(right_ts)
        >= F.col(left_ts) + F.expr(f"INTERVAL {lower}")
    ) & (
        F.col(right_ts)
        <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")
    )
    cond = bound
    for k in keys:
        cond = (lw[k] == rw[k]) & cond
    out = lw.join(rw, cond, how)
    # name-joined semantics: keep one copy of each key column
    # (coalesce covers the outer sides where one copy is NULL)
    for k in keys:
        out = out.withColumn(f"__k_{k}", F.coalesce(lw[k], rw[k]))
        out = out.drop(lw[k]).drop(rw[k]).withColumnRenamed(
            f"__k_{k}", k
        )
    return out


def attribute_conversions(
    impressions: DataFrame,
    clicks: DataFrame,
    user_col: str = "user_id",
    imp_ts: str = "imp_ts",
    click_ts: str = "click_ts",
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Click attribution: each click joined to EVERY impression for the
    same user in the preceding ``window`` (last-touch selection is a
    downstream keep-last — kept separate because stream-stream join
    output must stay append-mode; a per-click argmax would need an
    aggregation on top of the join, which Spark only allows after the
    join's own watermark horizon)."""
    return watermarked_interval_join(
        impressions,
        clicks,
        [user_col],
        imp_ts,
        click_ts,
        lower="0 seconds",
        upper=window,
        left_watermark=watermark,
        right_watermark=watermark,
    )
