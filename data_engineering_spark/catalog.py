"""Table loading for the engine's test/bench datasets.

The reference discovers tables dynamically from MySQL information_schema
(/root/reference/sanpshot_script.py:249-256) or Kafka topic names
(/root/reference/incremental_kafka_s3_cdc.py:437-449). For the parquet lake
core we expose the same "give me a table by name" surface over a directory
of parquet files, one file (or directory) per table.

Scans stay fully declarative: `spark.read.parquet` gives Catalyst the
FileSourceScanExec with predicate pushdown + column pruning for free.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    parquet = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.exists(parquet):
        return parquet
    # allow directory-per-table layouts too (how our own sinks write)
    return os.path.join(sf_dir, name)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark cannot read
    natively. Detected from one footer (driver-side, O(1)) via pyarrow."""
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pat
    except ImportError:  # pragma: no cover - pyarrow is a hard dep in practice
        return []
    footer = path
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return []
        footer = files[0]
    try:
        schema = pq.read_schema(footer)
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan with nanosecond-timestamp compatibility.

    Spark's TimestampType is microseconds; parquet TIMESTAMP(NANOS) raises
    PARQUET_TYPE_ILLEGAL. We read nanos as long
    (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to micros —
    identical to DuckDB's nanos→TIMESTAMP truncation, so oracle comparisons
    agree. The conversion is a cheap projection; pushdown/pruning on the
    other columns is unaffected.
    """
    path = table_path(sf_dir, name)
    ns_cols = _nanos_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # NTZ normalization must run on the RAW read schema, where nanos columns
    # are still LongType (nanosAsLong): re-reading with the post-conversion
    # schema would declare them TimestampType and the physical INT64 pages
    # would fail with PARQUET_COLUMN_DATA_TYPE_MISMATCH.
    df = _normalize_ntz(spark, df, path)
    for c in ns_cols:
        # integer `div`, not `/`: ns epoch values exceed double's 2^53
        # exact-integer range, float division would corrupt timestamps
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def _normalize_ntz(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Micros-without-timezone parquet columns infer as TIMESTAMP_NTZ on
    Spark 4 (`spark.sql.parquet.inferTimestampNTZ.enabled` defaults true),
    which breaks epoch functions (`unix_millis`) and streaming watermarks.
    DuckDB reads the same column as plain TIMESTAMP, so for oracle parity we
    re-read with an explicit TimestampType schema — the stored micros are
    taken as-is, the scan keeps pushdown/pruning, and no per-row cast is
    added to the plan.

    Preconditions / limits:
    - Oracle parity for tz-dependent renderings (hour, date_trunc, cast to
      string) holds because `registry.tune` pins
      spark.sql.session.timeZone=UTC; a non-UTC session would see shifted
      wall values from these functions.
    - Only top-level fields are rewritten. A TIMESTAMP_NTZ nested inside a
      struct/array/map passes through unnormalized — fine for the flat
      TPC-H/events tables this loader serves."""
    from pyspark.sql.types import (
        StructField,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    if not any(isinstance(f.dataType, TimestampNTZType) for f in df.schema.fields):
        return df
    # build a fresh StructType: df.schema is cached on the DataFrame and
    # mutating its fields in place would alias that cache
    schema = StructType(
        [
            StructField(
                f.name,
                TimestampType()
                if isinstance(f.dataType, TimestampNTZType)
                else f.dataType,
                f.nullable,
                f.metadata,
            )
            for f in df.schema.fields
        ]
    )
    return spark.read.schema(schema).parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TPCH_TABLES) -> None:
    """Register each table as a temp view so spark.sql() queries run as-is."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
