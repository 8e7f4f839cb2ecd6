"""Plan+input-keyed materialized result cache."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.result_cache import (
    cache_key,
    cached_result,
)

SF = "/root/testdata/sf0.001"


def _agg(spark):
    o = load_table(spark, SF, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


def test_cache_key_stable_and_sensitive(spark, tmp_path):
    k1 = cache_key(_agg(spark))
    k2 = cache_key(_agg(spark))  # rebuilt frame, new expr ids
    assert k1 == k2
    other = _agg(spark).filter(F.col("n") > 3)
    assert cache_key(other) != k1


def test_cache_key_tracks_input_state(spark, tmp_path):
    src = tmp_path / "t"
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(
        str(src)
    )
    df = spark.read.parquet(str(src)).groupBy("s").count()
    k1 = cache_key(df)
    time.sleep(0.05)
    spark.createDataFrame([(2, "b")], "id long, s string").write.mode(
        "append"
    ).parquet(str(src))
    df2 = spark.read.parquet(str(src)).groupBy("s").count()
    assert cache_key(df2) != k1  # new file => miss, never stale rows


def test_cached_result_serves_from_cache(spark, tmp_path):
    root = str(tmp_path / "cache")
    os.makedirs(root)
    first = cached_result(_agg(spark), root)
    want = sorted(map(tuple, first.collect()))
    assert len(os.listdir(root)) == 1
    # doctor the cached parquet; a second call must read IT (proving the
    # result is served from cache, not recomputed)
    dest = os.path.join(root, os.listdir(root)[0])
    doctored = spark.createDataFrame(
        [("ZZ", 1, 1.0)], "o_orderstatus string, n bigint, total double"
    )
    doctored.write.mode("overwrite").parquet(dest)
    second = cached_result(_agg(spark), root)
    assert [tuple(r) for r in second.collect()] == [("ZZ", 1, 1.0)]
    assert sorted(map(tuple, _agg(spark).collect())) == want  # sanity


def test_cache_rejects_unfingerprintable_sources(spark, tmp_path):
    """In-memory (LocalRelation) frames have no input files: a plan-only
    key could alias two different datasets or go stale on a JDBC table,
    so the cache must refuse instead of risking wrong results."""
    import pytest

    df = spark.createDataFrame([(1, "a")], "id long, s string").groupBy(
        "s"
    ).count()
    with pytest.raises(ValueError, match="file-backed"):
        cache_key(df)
    with pytest.raises(ValueError, match="file-backed"):
        cached_result(df, str(tmp_path))
