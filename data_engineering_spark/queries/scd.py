"""SCD Type 2 queries (oracle-checked).

The events table doubles as the change stream: user_id is the
dimension key, event_type the tracked attribute, (ts, event_id) the
total change order. Timestamps are emitted as epoch millis BIGINT
(the events_cdc.py convention) so hashes are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.functions.temporal import (
    timestamp_to_epoch_millis,
)
from data_engineering_spark.operators.scd import (
    scd2_as_of,
    scd2_build,
    scd2_merge,
)
from data_engineering_spark.registry import query

# full-history SCD2 build as DuckDB SQL — shared by the build oracle
# (with version) and the incremental-merge oracle (without, since merge
# equivalence is about intervals, not numbering)
_SCD2_CTE = """
    ordered AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER w AS rn,
             lag(event_type) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
    hist AS (
      SELECT user_id, event_type,
             ts AS valid_from,
             lead(ts) OVER w2 AS valid_to,
             CAST(row_number() OVER w2 AS INT) AS version
      FROM changes
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
"""

_SCD2_SELECT = """
    SELECT user_id, event_type,
           CAST(epoch_ms(valid_from) AS BIGINT) AS valid_from_ms,
           CAST(epoch_ms(valid_to) AS BIGINT) AS valid_to_ms,
           valid_to IS NULL AS is_current{version}
    FROM hist
"""


def _emit(dim: DataFrame, version: bool) -> DataFrame:
    cols = [
        "user_id",
        "event_type",
        timestamp_to_epoch_millis("valid_from").alias("valid_from_ms"),
        timestamp_to_epoch_millis("valid_to").alias("valid_to_ms"),
        "is_current",
    ]
    if version:
        cols.append("version")
    return dim.select(*cols)


@query(
    "q_scd2_user_history",
    oracle=f"WITH {_SCD2_CTE}"
    + _SCD2_SELECT.format(version=", version"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SCD2 build from the event change stream: per-user
    event_type history as validity intervals with no-op change
    suppression (operators/scd.scd2_build). One shuffle on user_id;
    the oracle recomputes the same intervals with window SQL."""
    e = load_table(spark, sf_dir, "events")
    dim = scd2_build(
        e, ["user_id"], ["event_type"], "ts", order_cols=["event_id"]
    )
    return _emit(dim, version=True)


@query(
    "q_scd2_point_in_time",
    oracle=f"""
    WITH {_SCD2_CTE}
    SELECT user_id, event_type,
           CAST(epoch_ms(valid_from) AS BIGINT) AS valid_from_ms,
           version
    FROM hist
    WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
    """,
)
def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension slice: each user's attribute AS OF
    2024-01-15 (operators/scd.scd2_as_of) — the lookup a fact join
    does against event-time. Pure filter over the history, no extra
    shuffle beyond the build."""
    e = load_table(spark, sf_dir, "events")
    dim = scd2_build(
        e, ["user_id"], ["event_type"], "ts", order_cols=["event_id"]
    )
    return scd2_as_of(dim, "2024-01-15 00:00:00").select(
        "user_id",
        "event_type",
        timestamp_to_epoch_millis("valid_from").alias("valid_from_ms"),
        "version",
    )


@query(
    "q_scd2_incremental_merge",
    oracle=f"WITH {_SCD2_CTE}" + _SCD2_SELECT.format(version=""),
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance: history built from changes before
    2024-01-20, then the remaining changes applied with
    operators/scd.scd2_merge — which reopens only the touched keys'
    CURRENT rows and never rescans closed history. The oracle is the
    full one-shot rebuild, proving the incremental algebra exact."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    state = scd2_build(
        e.filter(F.col("ts") < cut),
        ["user_id"],
        ["event_type"],
        "ts",
        order_cols=["event_id"],
    )
    merged = scd2_merge(
        state,
        e.filter(F.col("ts") >= cut),
        ["user_id"],
        ["event_type"],
        "ts",
        order_cols=["event_id"],
    )
    return _emit(merged, version=False)
