"""Round-trip + pushdown tests for the non-parquet format helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.sources.formats import (
    read_table,
    write_table,
)

SF = "/root/testdata/sf0.001"


def _norm(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_round_trip_orders(spark, tmp_path, fmt):
    """orders has ints, strings, decimals and dates — every column must
    survive the format round-trip exactly (CSV/JSON via explicit
    schema; ORC natively)."""
    src = load_table(spark, SF, "orders")
    path = str(tmp_path / fmt)
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _norm(back) == _norm(src)


def test_round_trip_events_timestamps(spark, tmp_path):
    """Microsecond timestamps survive CSV (the configured
    timestampFormat) and ORC."""
    src = load_table(spark, SF, "events").select("event_id", "ts")
    for fmt in ("orc", "csv"):
        path = str(tmp_path / f"ev_{fmt}")
        write_table(src, path, fmt)
        back = read_table(spark, path, fmt, schema=src.schema)
        assert _norm(back) == _norm(src), fmt


def test_csv_requires_schema(spark, tmp_path):
    src = load_table(spark, SF, "region")
    path = str(tmp_path / "csv")
    write_table(src, path, "csv")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, path, "csv")


def test_avro_gated(spark, tmp_path):
    src = load_table(spark, SF, "region")
    with pytest.raises(NotImplementedError, match="spark-avro"):
        write_table(src, str(tmp_path / "avro"), "avro")


def test_orc_predicate_pushdown_and_pruning(spark, tmp_path):
    """ORC scans must push filters and prune columns like parquet — the
    scale properties the lake relies on, asserted on the plan."""
    src = load_table(spark, SF, "orders")
    path = str(tmp_path / "orc_push")
    write_table(src, path, "orc")
    q = (
        read_table(spark, path, "orc")
        .filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_totalprice")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_totalprice" in read_schema
    assert "o_comment" not in read_schema  # pruned


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """partition_by produces hive-layout dirs and the reader prunes
    partitions on filter (PartitionFilters in the scan)."""
    import os

    src = load_table(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "by_year")
    write_table(src, path, "orc", partition_by=["o_year"])
    years = {
        d for d in os.listdir(path) if d.startswith("o_year=")
    }
    assert len(years) > 1
    q = read_table(spark, path, "orc").filter(F.col("o_year") == 1995)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert q.count() == src.filter(F.col("o_year") == 1995).count()
