"""Debezium temporal-semantic conversions (SURVEY.md §2.8 F4-F7).

The reference converts Debezium's integer-encoded temporal types after
parsing the CDC payload (/root/reference/incremental_kafka_s3_cdc.py:222-238):

- `io.debezium.time.Date`            int days since epoch   (:228-229)
- `io.debezium.time.Timestamp`       int64 epoch millis     (:230-231)
- `io.debezium.time.MicroTimestamp`  int64 epoch micros     (:232-233)
- `io.debezium.time.MicroTime`       int64 micros-of-day    (:237-238)
- `io.debezium.time.ZonedTimestamp`  ISO-8601 string        (:226-227)

The reference routes everything through `to_timestamp(from_unixtime(x /
1000))` — string-formatting round-trips that truncate sub-second
precision and depend on the session zone. We use the direct builtins
(`timestamp_millis`/`timestamp_micros`/`date_add`), which are exact,
DST-safe, and stay in whole-stage codegen. Call `registry.tune` (UTC
session) before relying on wall-clock equality with external systems.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS_PER_DAY = 86_400_000_000


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_days_to_date(col: Column | str) -> Column:
    """Debezium Date: days since 1970-01-01 → DateType.

    `date_add` does calendar arithmetic — no `*86400` seconds detour
    (the reference's `to_date(from_unixtime(c*86400))` is DST/zone
    sensitive; this is not)."""
    return F.date_add(F.lit("1970-01-01").cast("date"), _c(col).cast("int"))


def epoch_millis_to_timestamp(col: Column | str) -> Column:
    """Debezium Timestamp: epoch milliseconds → TimestampType (exact)."""
    return F.timestamp_millis(_c(col).cast("long"))


def epoch_micros_to_timestamp(col: Column | str) -> Column:
    """Debezium MicroTimestamp: epoch microseconds → TimestampType."""
    return F.timestamp_micros(_c(col).cast("long"))


def micros_of_day_to_seconds(col: Column | str) -> Column:
    """Debezium MicroTime: micros since midnight → seconds since midnight
    (long). The reference materializes MySQL TIME as a long (its type map
    sends `time → long`, incremental_kafka_s3_cdc.py:69)."""
    c = _c(col).cast("long")
    return ((c % MICROS_PER_DAY) / 1_000_000).cast("long")


def zoned_string_to_timestamp(col: Column | str) -> Column:
    """Debezium ZonedTimestamp: ISO-8601 string → TimestampType."""
    return F.to_timestamp(_c(col))


def timestamp_to_epoch_millis(col: Column | str) -> Column:
    return F.unix_millis(_c(col))


def timestamp_to_epoch_micros(col: Column | str) -> Column:
    return F.unix_micros(_c(col))
