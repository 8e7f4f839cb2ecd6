"""Lake writer: partitioned / bucketed parquet tables.

The reference writes via Iceberg with hash distribution + 512 MB target
files (incremental_kafka_s3_cdc.py:130-137) and repartition(500) before
append (sanpshot_script.py:233). The parquet-core equivalents:

- `write_table`: partitionBy + optional file-count sizing from a target
  file size (instead of a hardcoded repartition constant).
- `write_bucketed_table`: hash-bucketed catalog table. Bucketing is the
  100 TB lever SCALE.md calls out: two tables bucketed on the same key
  join WITHOUT a shuffle — the exchange disappears from the plan
  (asserted in tests/test_bucketing.py, not just claimed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

TARGET_FILE_BYTES = 512 * 1024 * 1024


def write_table(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    mode: str = "overwrite",
    target_rows_per_file: int | None = None,
) -> None:
    """Plain parquet write; `target_rows_per_file` sizes output files
    explicitly when AQE's coalescing isn't in play (streaming epochs)."""
    if target_rows_per_file:
        n = df.count()
        df = df.coalesce(max(1, -(-n // target_rows_per_file)))
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Hash-bucketed (and optionally sorted) catalog table. Joins and
    aggregations on `bucket_by` between tables with matching bucketing
    read co-located data and skip the shuffle entirely.

    `path` makes it an external table (warehouse.dir is a static conf —
    it can't be pointed at a scratch dir after session start)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
