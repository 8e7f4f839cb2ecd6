"""Unit tests: type mappings, compat casts, schema evolution, partition
spec inference (SURVEY.md §1.2-1.3 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_spark.cdc.schema_evolution import (
    PartitionSpec,
    align_batch,
    diff_columns,
    infer_partition_spec,
    parse_partition_spec,
)
from data_engineering_spark.types.casts import (
    cast_frame,
    compat_cast_booleans,
    sanitize_column_name,
    sanitize_columns,
)
from data_engineering_spark.types.mappings import (
    debezium_type_to_spark,
    mysql_type_to_spark,
)


def test_mysql_mapping_reference_semantics():
    # the reference's deliberate choices (incremental_kafka_s3_cdc.py:44-82)
    assert mysql_type_to_spark("decimal(20,2)") == "decimal(38,2)"
    assert mysql_type_to_spark("boolean") == "int"
    assert mysql_type_to_spark("smallint") == "int"
    assert mysql_type_to_spark("tinyint") == "int"
    assert mysql_type_to_spark("time") == "bigint"
    assert mysql_type_to_spark("datetime") == "timestamp"
    assert mysql_type_to_spark("date") == "date"
    assert mysql_type_to_spark("json") == "string"
    assert mysql_type_to_spark("enum('a','b')") == "string"
    assert mysql_type_to_spark("polygon") == "string"
    assert mysql_type_to_spark("varbinary(16)") == "string"
    assert mysql_type_to_spark("VARCHAR(255)") == "string"
    assert mysql_type_to_spark("made_up_type") == "string"  # total


def test_debezium_mapping():
    assert debezium_type_to_spark("int16") == T.ShortType()
    assert debezium_type_to_spark("int32") == T.IntegerType()
    assert debezium_type_to_spark("int64") == T.LongType()
    assert debezium_type_to_spark("float32") == T.FloatType()
    assert debezium_type_to_spark("float64") == T.DoubleType()
    assert debezium_type_to_spark("boolean") == T.BooleanType()
    assert debezium_type_to_spark("bytes") == T.StringType()
    assert debezium_type_to_spark("whatever") == T.StringType()


def test_sanitize_names(spark):
    assert sanitize_column_name("  Order ID ") == "order_id"
    df = spark.createDataFrame([(1, 2)], ["Col One", "COL_TWO "])
    assert sanitize_columns(df).columns == ["col_one", "col_two"]


def test_compat_cast_booleans(spark):
    df = spark.createDataFrame(
        [(True, 1, 100)],
        T.StructType([
            T.StructField("b", T.BooleanType()),
            T.StructField("s", T.ShortType()),
            T.StructField("i", T.IntegerType()),
        ]),
    )
    out = compat_cast_booleans(df)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "int", "int", "int",
    ]
    assert out.collect()[0][0] == 1


def test_cast_frame(spark):
    target = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("missing", T.DoubleType()),
    ])
    df = spark.createDataFrame([("1", 2, "extra")], ["a", "b", "extra"])
    out = cast_frame(df, target)
    assert out.columns == ["a", "b", "missing"]
    row = out.collect()[0]
    assert row["a"] == 1 and row["b"] == "2" and row["missing"] is None


def test_diff_and_align(spark):
    to_add, backfill = diff_columns(["a", "b", "new"], ["a", "b", "gone"])
    assert to_add == ["new"] and backfill == ["gone"]
    batch = spark.createDataFrame([(1, 2, 3)], ["a", "b", "new"])
    aligned = align_batch(batch, ["a", "b", "gone"])
    assert aligned.columns == ["a", "b", "gone", "new"]
    assert aligned.collect()[0]["gone"] is None


def test_partition_spec_inference():
    created = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ])
    spec = infer_partition_spec(created)
    assert (spec.column, spec.transform) == ("created_at", "months")
    assert spec.to_ddl() == "months(created_at)"

    # nullable create column → not eligible (reference :212 non-nullable)
    nullable = T.StructType([
        T.StructField("created_at", T.TimestampType(), True),
    ])
    assert infer_partition_spec(nullable).column == "__rds_id"

    # name must contain 'create'
    other = T.StructType([
        T.StructField("updated_at", T.TimestampType(), False),
    ])
    assert infer_partition_spec(other).column == "__rds_id"


def test_parse_partition_spec():
    assert parse_partition_spec("months(created_at)") == PartitionSpec(
        "created_at", "months"
    )
    assert parse_partition_spec("bucket(id)") == PartitionSpec("id", "bucket")
    assert parse_partition_spec("__rds_id") == PartitionSpec("__rds_id", None)


def test_align_to_columns(spark):
    from data_engineering_spark.types.casts import align_to_columns

    df = spark.createDataFrame([(1, "a")], ["id", "x"])
    out = align_to_columns(df, ["id", "gone", "x"])
    assert out.columns == ["id", "gone", "x"]
    assert out.collect()[0]["gone"] is None


def test_widen_type_lattice():
    from pyspark.sql import types as T

    from data_engineering_spark.cdc.schema_evolution import widen_type

    assert isinstance(widen_type(T.IntegerType(), T.LongType()), T.LongType)
    assert isinstance(widen_type(T.ShortType(), T.ByteType()), T.ShortType)
    assert isinstance(widen_type(T.FloatType(), T.DoubleType()), T.DoubleType)
    assert isinstance(widen_type(T.LongType(), T.DoubleType()), T.DoubleType)
    d = widen_type(T.DecimalType(10, 2), T.DecimalType(12, 4))
    assert (d.precision, d.scale) == (12, 4)
    assert widen_type(T.StringType(), T.LongType()) is None
    assert widen_type(T.StringType(), T.StringType()) is not None


def test_merge_widens_promoted_column(spark, tmp_path):
    """A batch that promotes val int->long (and adds a float where the
    table has double) merges cleanly; values survive exactly."""
    from data_engineering_spark.operators.merge import MergeTable

    t = MergeTable(spark, str(tmp_path / "widen"), ["id"])
    first = spark.createDataFrame(
        [(1, 10, 0.5, 100, "c")], "id long, val int, f double, __ts_ms long, __op string"
    )
    t.merge(first)
    big = 1 << 40
    second = spark.createDataFrame(
        [(2, big, 0.25, 200, "c"), (1, 11, 0.75, 200, "u")],
        "id long, val long, f float, __ts_ms long, __op string",
    )
    t.merge(second)
    rows = {r["id"]: r for r in t.read().collect()}
    assert rows[2]["val"] == big
    assert rows[1]["val"] == 11
    assert dict(t.read().dtypes)["val"] == "bigint"
    assert dict(t.read().dtypes)["f"] == "double"
    assert rows[2]["f"] == 0.25


def test_merge_rejects_incompatible_type_change(spark, tmp_path):
    import pytest

    from data_engineering_spark.operators.merge import MergeTable

    t = MergeTable(spark, str(tmp_path / "incompat"), ["id"])
    t.merge(spark.createDataFrame(
        [(1, 5, 100, "c")], "id long, val int, __ts_ms long, __op string"))
    bad = spark.createDataFrame(
        [(2, "x", 200, "c")], "id long, val string, __ts_ms long, __op string")
    with pytest.raises(TypeError, match="val"):
        t.merge(bad)


def test_compat_report_classification():
    from pyspark.sql import types as T

    from data_engineering_spark.cdc.schema_evolution import compat_report

    old = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("v", T.FloatType(), True),
            T.StructField("s", T.StringType(), True),
            T.StructField("gone", T.StringType(), True),
            T.StructField("tight", T.StringType(), True),
        ]
    )
    new = T.StructType(
        [
            T.StructField("id", T.LongType(), False),       # widened
            T.StructField("v", T.StringType(), True),       # breaking
            T.StructField("s", T.StringType(), True),       # unchanged
            T.StructField("tight", T.StringType(), False),  # tightened
            T.StructField("extra", T.DoubleType(), True),   # safe add
            T.StructField("req", T.LongType(), False),      # warning add
        ]
    )
    rep = {(c, sev) for c, _, sev in compat_report(old, new)}
    assert rep == {
        ("id", "safe"),
        ("v", "breaking"),
        ("tight", "breaking"),
        ("extra", "safe"),
        ("req", "warning"),
        ("gone", "breaking"),
    }
