"""Catalog metadata scans (S5), audit log, and the pandas_udf alternate
similarity path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.similarity import (
    as_double_vec,
    cosine,
    cosine_pandas_udf,
)
from data_engineering_spark.snapshot.jdbc_snapshot import (
    record_audit,
    snapshotted_tables,
)
from data_engineering_spark.sources.catalog_meta import (
    data_columns,
    describe_table,
    existing_tables,
    partition_spec_from_describe,
    show_tables,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def part_table(spark, tmp_path_factory):
    name = "cat_meta_sales"
    wh = tmp_path_factory.mktemp("wh")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} (sale_id BIGINT, item_id INT, price DOUBLE, "
        f"region STRING) USING parquet PARTITIONED BY (region) "
        f"LOCATION '{wh}/{name}'"
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_show_and_describe(spark, part_table):
    assert part_table in existing_tables(spark)
    assert show_tables(spark).filter(
        F.col("tableName") == part_table
    ).count() == 1
    desc = describe_table(spark, part_table)
    assert {"col_name", "data_type"} <= set(desc.columns)


def test_data_columns_excludes_partition_section(spark, part_table):
    assert data_columns(spark, part_table) == [
        "sale_id", "item_id", "price", "region",
    ]


def test_partition_spec_from_describe(spark, part_table):
    spec = partition_spec_from_describe(spark, part_table)
    assert spec is not None
    assert spec.column == "region" and spec.transform is None


def test_audit_log_roundtrip(spark, tmp_path):
    root = str(tmp_path)
    assert snapshotted_tables(spark, root, 1) == set()
    record_audit(spark, root, 1, "oms1", "sales", "lake.sales")
    record_audit(spark, root, 1, "oms1", "orders", "lake.orders")
    # schema-qualified: oms2.sales must NOT look done after oms1.sales
    # (multi-database patterns share table names across databases)
    assert snapshotted_tables(spark, root, 1) == {
        "oms1.sales", "oms1.orders"
    }
    assert "oms2.sales" not in snapshotted_tables(spark, root, 1)
    assert snapshotted_tables(spark, root, 2) == set()


def test_load_table_mixed_nanos_and_ntz(spark, tmp_path):
    """A table with BOTH a TIMESTAMP(NANOS) column and a micros
    no-timezone column must load: NTZ normalization has to happen on the
    raw schema (ns column still LongType under nanosAsLong), otherwise the
    explicit re-read schema mismatches the physical INT64 pages."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns = pa.array([1_700_000_000_123_456_789, 1_700_000_001_000_000_000],
                  type=pa.timestamp("ns"))
    us = pa.array([1_700_000_000_000_001, 1_700_000_002_000_002],
                  type=pa.timestamp("us"))
    table = pa.table({"ts_ns": ns, "ts_us": us, "k": pa.array([1, 2])})
    path = str(tmp_path / "mixed.parquet")
    pq.write_table(table, path)

    df = load_table(spark, str(tmp_path), "mixed")
    types = dict(df.dtypes)
    assert types["ts_ns"] == "timestamp"
    assert types["ts_us"] == "timestamp"
    rows = {r["k"]: r for r in df.collect()}
    # nanos truncate to micros; micros pass through unchanged
    assert rows[1]["ts_ns"].microsecond == 123456
    assert rows[1]["ts_us"].microsecond == 1
    assert rows[2]["ts_us"].microsecond == 2


def test_pandas_udf_cosine_matches_builtin(spark):
    e = load_table(spark, SF, "embeddings").limit(50)
    a = e.select(
        F.col("vec_id").alias("ia"), as_double_vec("embedding").alias("va")
    )
    b = e.select(
        F.col("vec_id").alias("ib"), as_double_vec("embedding").alias("vb")
    )
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    cos_udf = cosine_pandas_udf()
    both = pairs.select(
        "ia",
        "ib",
        cosine(F.col("va"), F.col("vb")).alias("builtin"),
        cos_udf(F.col("va"), F.col("vb")).alias("arrow"),
    )
    bad = both.filter(
        F.abs(F.col("builtin") - F.col("arrow")) > 1e-9
    ).count()
    assert bad == 0


def test_spark_sql_surface_matches_dataframe_queries(spark):
    """The SQL entry point (catalog.register_views + spark.sql) is a
    first-class way in: the same ANSI query text a warehouse user would
    write produces bit-identical results to the DataFrame
    implementation for a representative aggregate + join + window."""
    from data_engineering_spark.catalog import register_views
    from data_engineering_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    register_views(spark, sf)

    sql_q1 = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """)
    df_q1 = QUERIES["q01_pricing_summary"](spark, sf).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    a = {tuple(r) for r in sql_q1.collect()}
    b = {tuple(r) for r in df_q1.collect()}
    assert a == b and len(a) > 0

    sql_topk = spark.sql("""
        SELECT * FROM (
          SELECT n_name, c_name, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY n_name
                   ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer JOIN nation ON c_nationkey = n_nationkey)
        WHERE rn <= 3
    """)
    df_topk = QUERIES["q_top3_customers_per_nation"](spark, sf)
    assert sql_topk.count() == df_topk.count() > 0
