"""Live Iceberg MERGE INTO integration test — env-gated.

The reference's actual sink executes MERGE INTO against an Iceberg
catalog (/root/reference/incremental_kafka_s3_cdc.py:243-292).
`merge_into_sql` builds that exact statement and the parquet COW
backend carries the driver tests, but executing the SQL needs the
Iceberg *runtime jar*, which is not in this sandbox (no
iceberg-spark-runtime under /opt/spark/jars, no network to fetch one —
probed round 3). When a jar IS available, point ICEBERG_SPARK_JAR at
it and this test runs the statement against a local hadoop catalog and
checks the post-merge table equals the parquet backend's result on the
same golden CDC fixture.

Run it in its OWN pytest process (`pytest tests/test_iceberg_live.py`):
`spark.jars` / catalog extensions only apply at JVM startup, so the
shared session fixture from a full-suite run would shadow the configs.
"""

from __future__ import annotations

import os

import pytest

JAR = os.environ.get("ICEBERG_SPARK_JAR", "")

pytestmark = pytest.mark.skipif(
    not (JAR and os.path.exists(JAR)),
    reason=(
        "Iceberg runtime jar not available: set ICEBERG_SPARK_JAR to an "
        "iceberg-spark-runtime jar to execute the live MERGE INTO path "
        "(this sandbox has no jar and no network; the statement builder "
        "and the parquet COW twin are tested everywhere else)"
    ),
)


# golden CDC fixture: initial load + a second batch of upsert/delete/new
INITIAL = [
    (1, 10, "a", "u"),
    (2, 20, "b", "u"),
    (3, 30, "c", "u"),
]
BATCH2 = [
    (2, 21, "b2", "u"),  # update
    (3, 30, "c", "d"),   # delete
    (4, 40, "d", "c"),   # insert
]
COLS = ["id", "amount", "label", "__op"]


def _frame(spark, rows):
    from pyspark.sql import functions as F

    return (
        spark.createDataFrame(
            rows, "id int, amount int, label string, __op string"
        )
        .withColumn("__rds_id", F.lit(1))
        .withColumn("__tenant_id", F.lit(7))
    )


def test_live_merge_matches_parquet_backend(tmp_path):
    """Executes merge_into_sql against a real Iceberg hadoop catalog and
    compares the final table to MergeTable (parquet COW) on the same
    fixture."""
    from pyspark.sql import SparkSession

    from data_engineering_spark.operators.merge import (
        MergeTable,
        merge_into_sql,
    )

    wh = str(tmp_path / "wh")
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.jars", JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.lake",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", wh)
        .getOrCreate()
    )
    try:
        all_cols = ["__rds_id", "__tenant_id", *COLS[:-1]]
        initial = _frame(spark, INITIAL)
        initial.drop("__op").writeTo("lake.db.sales").create()

        batch = _frame(spark, BATCH2)
        batch.createOrReplaceTempView("cdc_source")
        spark.sql(
            merge_into_sql(
                "lake.db.sales",
                "cdc_source",
                key_columns=["id"],
                all_columns=all_cols,
            )
        )
        live = sorted(
            map(tuple, spark.table("lake.db.sales").select(*all_cols).collect())
        )

        # parquet COW twin on the identical fixture
        path = str(tmp_path / "pq")
        t = MergeTable(spark, path, ["__rds_id", "__tenant_id", "id"])
        t.merge(initial)
        t.merge(batch)
        pq = sorted(
            map(tuple, spark.read.parquet(path).select(*all_cols).collect())
        )
        assert live == pq
        ids = [r[2] for r in live]
        assert ids == [1, 2, 4]  # 3 deleted, 2 updated, 4 inserted
    finally:
        spark.stop()
