"""Catalog metadata scans (SURVEY.md §2.1 S5).

The reference reads DESCRIBE / SHOW TABLES output as DataFrames and
regex-filters the rows to split data columns from the partition spec
(/root/reference/incremental_kafka_s3_cdc.py:89-94, 104-124;
sanpshot_script.py:248, 257). Same surface here, over any Spark catalog
(in-memory, Hive, Iceberg): the DESCRIBE contract — a `# Partition
Information` section trailer — is identical across them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.cdc.schema_evolution import (
    PartitionSpec,
    parse_partition_spec,
)


def show_tables(spark: SparkSession, database: str | None = None) -> DataFrame:
    return spark.sql(
        f"SHOW TABLES IN {database}" if database else "SHOW TABLES"
    )


def describe_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.sql(f"DESCRIBE TABLE {table}")


def data_columns(spark: SparkSession, table: str) -> list[str]:
    """Column names excluding the partition-info section — the
    reference's rlike filter chain (:89-94) made explicit: drop section
    headers (`# ...`), blank separator rows, and the partition columns
    re-listed below the `# Partition Information` marker."""
    desc = describe_table(spark, table).collect()
    cols: list[str] = []
    for row in desc:
        name = (row["col_name"] or "").strip()
        if name.startswith("#") or name == "":
            break  # partition section begins
        cols.append(name)
    return cols


def partition_spec_from_describe(
    spark: SparkSession, table: str
) -> PartitionSpec | None:
    """Partition column (+transform when the catalog reports one, e.g.
    Iceberg `months(col)`) from DESCRIBE output — reference
    get_partition_key_and_function (:104-124)."""
    desc = describe_table(spark, table)
    part_rows = (
        desc.filter(F.col("col_name").rlike(r"^Part \d+"))
        .sort("col_name")
        .collect()
    )
    if part_rows:
        return parse_partition_spec(part_rows[0]["data_type"])
    # fallback format: columns listed again after '# Partition Information'
    rows = desc.collect()
    in_section = False
    for row in rows:
        name = (row["col_name"] or "").strip()
        if name.startswith("# Partition Information"):
            in_section = True
            continue
        if in_section and name and not name.startswith("#"):
            return parse_partition_spec(name)
    return None


def existing_tables(spark: SparkSession, database: str | None = None) -> set[str]:
    """Driver-side set of table names (reference sanpshot_script.py:248
    uses this to skip already-snapshotted tables, P5/J2)."""
    return {
        r["tableName"] for r in show_tables(spark, database).collect()
    }
