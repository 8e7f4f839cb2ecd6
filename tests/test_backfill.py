"""Partition-scoped backfill (operators/backfill)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.backfill import backfill_partitions


def _source(spark, path):
    spark.range(400).select(
        F.col("id"),
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 2).alias("v"),
    ).write.partitionBy("p").mode("overwrite").parquet(path)


def test_backfill_rewrites_only_requested_partitions(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    _source(spark, src)

    def v1(df):
        return df.withColumn("derived", F.col("v") + 1)

    # initial full build
    n = backfill_partitions(spark, src, tgt, "p", [0, 1, 2, 3], v1)
    assert n == 400

    # logic changes; backfill only partitions 2 and 3
    def v2(df):
        return df.withColumn("derived", F.col("v") * 10)

    import glob
    before = {
        f: None for f in glob.glob(f"{tgt}/p=0/*.parquet")
        + glob.glob(f"{tgt}/p=1/*.parquet")
    }
    n2 = backfill_partitions(spark, src, tgt, "p", [2, 3], v2)
    assert n2 == 200
    # untouched partitions keep their exact files
    after = set(
        glob.glob(f"{tgt}/p=0/*.parquet") + glob.glob(f"{tgt}/p=1/*.parquet")
    )
    assert after == set(before)

    got = spark.read.parquet(tgt)
    old = got.filter(F.col("p") <= 1).select(
        (F.col("derived") - F.col("v")).alias("d")).distinct().collect()
    new = got.filter(F.col("p") >= 2).select(
        (F.col("derived") / F.col("v")).alias("d")).distinct().collect()
    assert [r["d"] for r in old] == [1]
    assert [r["d"] for r in new] == [10.0]
    assert got.count() == 400


def test_backfill_guards(spark, tmp_path):
    import pytest

    src = str(tmp_path / "src2")
    _source(spark, src)
    assert backfill_partitions(
        spark, src, str(tmp_path / "t2"), "p", [], lambda d: d
    ) == 0
    with pytest.raises(ValueError, match="partition column"):
        backfill_partitions(
            spark, src, str(tmp_path / "t2"), "p", [0],
            lambda d: d.drop("p"),
        )
    # a transform that leaks rows outside the window cannot clobber
    # other partitions
    tgt = str(tmp_path / "t3")
    backfill_partitions(spark, src, tgt, "p", [0, 1, 2, 3], lambda d: d)
    backfill_partitions(
        spark, src, tgt, "p", [0],
        lambda d: spark.read.parquet(src),  # returns ALL partitions
    )
    assert spark.read.parquet(tgt).count() == 400
