"""Advanced streaming: watermarked windows and custom stateful operators.

Beyond the reference's CDC shell (trigger-once foreachBatch), the engine
exposes the Structured Streaming surface the brief requires:

- `watermarked_window_counts`: event-time tumbling aggregation with a
  watermark — late data beyond the bound is dropped and state is
  reclaimed (without a watermark, window state grows forever on an
  unbounded stream).
- `running_dedup_counts`: a custom stateful operator via
  `applyInPandasWithState` — per-key state (seen-set fingerprint +
  running count) maintained across micro-batches, the building block
  for streaming exact-dedup at ingest time.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, n_distinct_types long"
STATE_SCHEMA = "n long, types array<string>"


def watermarked_window_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time counts with bounded state. The identical plan
    runs in batch (tests) and incrementally under readStream — that
    equivalence is Structured Streaming's core contract.

    The group key must be the window() expression ITSELF: grouping by
    window(...).getField('start') strips the event-time metadata, so
    Spark sees a streaming aggregation WITHOUT a watermark — append
    mode is rejected outright and in update mode window state
    accumulates forever (verified on this Spark version). The start
    field projects out AFTER the aggregate."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("__w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("__w").getField("start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact-dedup with bounded state: duplicates of a key are
    dropped as long as they arrive within the watermark of the first
    sighting; state for older keys is reclaimed. This is the
    ingest-time guard against at-least-once upstream delivery (Kafka
    producer retries), complementing the idempotent MERGE downstream."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def running_dedup_counts(events: DataFrame) -> DataFrame:
    """Per-user running totals + distinct-event-type tracking across
    micro-batches via applyInPandasWithState.

    State per key: (running count, seen event types). Each micro-batch
    updates state and emits one row per active user. Timeout: none —
    state lives for the stream's lifetime (a TTL via
    GroupStateTimeout.ProcessingTimeTimeout is one line away for
    unbounded key spaces).
    """
    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.exists:
            n, types = state.get
            seen = set(types)
        else:
            n, seen = 0, set()
        for pdf in pdfs:
            n += len(pdf)
            seen.update(pdf["event_type"].tolist())
        state.update((n, sorted(seen)))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "n_distinct_types": [len(seen)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counts_tws(events: DataFrame) -> DataFrame:
    """The same running per-user counters as `running_dedup_counts`,
    on Spark 4's `transformWithStateInPandas` — the successor to
    applyInPandasWithState with typed composite state (ValueState /
    ListState / MapState), per-state TTL, and timers. Here: one
    ValueState holding (count, seen-types) per user.

    Both implementations are kept: applyInPandasWithState is the
    stable battle-tested API; transformWithState is where new stateful
    features (TTL, timers, state schema evolution) land.

    ENVIRONMENT GATE: transformWithState's control channel is protobuf;
    containers without `google.protobuf` cannot run it (raises
    NotImplementedError up front). The applyInPandasWithState twin
    covers the same semantics everywhere.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without protobuf
        raise NotImplementedError(
            "transformWithStateInPandas requires protobuf "
            "(use running_dedup_counts in this environment)"
        ) from e

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "counts", STATE_SCHEMA
            )

        def handleInputRows(
            self, key, rows, timerValues
        ) -> Iterator["pd.DataFrame"]:
            (user_id,) = key
            if self._state.exists():
                n, types = self._state.get()
                seen = set(types)
            else:
                n, seen = 0, set()
            for pdf in rows:
                n += len(pdf)
                seen.update(pdf["event_type"].tolist())
            self._state.update((n, sorted(seen)))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "n_distinct_types": [len(seen)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningCounts(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
