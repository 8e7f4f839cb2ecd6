"""Watermarked stream-stream interval join: the streaming result must
equal the batch interval join of the same data, across micro-batch
boundaries, and the wrapper must enforce its correctness contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.streaming.joins import (
    attribute_conversions,
    watermarked_interval_join,
)

IMP_SCHEMA = "user_id long, imp_id long, imp_ts timestamp"
CLK_SCHEMA = "user_id long, click_id long, click_ts timestamp"


def _ts(s):
    return f"2024-01-01 {s}"


IMPRESSIONS = [
    (1, 100, _ts("10:00:00")),
    (1, 101, _ts("10:20:00")),
    (2, 200, _ts("10:00:00")),
    (3, 300, _ts("11:00:00")),
]
CLICKS = [
    (1, 9000, _ts("10:25:00")),  # joins imps 100 (25m) and 101 (5m)
    (2, 9001, _ts("10:45:00")),  # 45m after imp 200 -> outside window
    (4, 9002, _ts("10:10:00")),  # no impression for user 4
]


def _frames(spark, imps, clks):
    i = spark.createDataFrame(
        [(u, k, t) for u, k, t in imps], "user_id long, imp_id long, imp_ts string"
    ).withColumn("imp_ts", F.to_timestamp("imp_ts"))
    c = spark.createDataFrame(
        [(u, k, t) for u, k, t in clks],
        "user_id long, click_id long, click_ts string",
    ).withColumn("click_ts", F.to_timestamp("click_ts"))
    return i, c


def test_batch_attribution_semantics(spark):
    i, c = _frames(spark, IMPRESSIONS, CLICKS)
    got = sorted(
        (r["user_id"], r["imp_id"], r["click_id"])
        for r in attribute_conversions(i, c).collect()
    )
    assert got == [(1, 100, 9000), (1, 101, 9000)]


def test_streaming_equals_batch(spark, tmp_path):
    """File-source streams with forced micro-batch splits must produce
    exactly the batch join's rows — pairs whose halves arrive in
    DIFFERENT micro-batches are the case stream-stream state exists
    for."""
    i, c = _frames(spark, IMPRESSIONS, CLICKS)
    want = sorted(
        (r["user_id"], r["imp_id"], r["click_id"])
        for r in attribute_conversions(i, c).collect()
    )

    imp_dir, clk_dir = tmp_path / "imps", tmp_path / "clicks"
    # one file per row -> maxFilesPerTrigger=1 forces each row into its
    # own micro-batch, so every joined pair crosses a batch boundary
    for row in IMPRESSIONS:
        _frames(spark, [row], [])[0].coalesce(1).write.mode(
            "append"
        ).parquet(str(imp_dir))
    for row in CLICKS:
        _frames(spark, [], [row])[1].coalesce(1).write.mode(
            "append"
        ).parquet(str(clk_dir))

    si = (
        spark.readStream.schema(IMP_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(imp_dir))
    )
    sc = spark.readStream.schema(CLK_SCHEMA).parquet(str(clk_dir))
    joined = attribute_conversions(si, sc)
    q = (
        joined.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["imp_id"], r["click_id"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == want


def test_interval_join_bounds_and_keys(spark):
    i, c = _frames(spark, IMPRESSIONS, CLICKS)
    # widening the window to 1 hour pulls in the (2, 200, 9001) pair
    wide = watermarked_interval_join(
        i, c, ["user_id"], "imp_ts", "click_ts", upper="1 hour"
    )
    got = sorted(
        (r["user_id"], r["imp_id"], r["click_id"]) for r in wide.collect()
    )
    assert (2, 200, 9001) in got and len(got) == 3
    # key column appears exactly once in the output
    assert wide.columns.count("user_id") == 1

    with pytest.raises(ValueError, match="distinct column names"):
        watermarked_interval_join(i, c, ["user_id"], "imp_ts", "imp_ts")
    with pytest.raises(ValueError, match="at least one key"):
        watermarked_interval_join(i, c, [], "imp_ts", "click_ts")


def test_left_outer_keeps_unmatched_impressions(spark):
    i, c = _frames(spark, IMPRESSIONS, CLICKS)
    out = watermarked_interval_join(
        i, c, ["user_id"], "imp_ts", "click_ts", how="left_outer"
    )
    rows = {(r["imp_id"], r["click_id"]) for r in out.collect()}
    # unmatched impressions survive with NULL click halves
    assert (200, None) in rows and (300, None) in rows
    assert (100, 9000) in rows and (101, 9000) in rows
