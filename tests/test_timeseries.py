"""Unit tests for the time-series operators (as-of join, interval
join, hypertable rollup) — edge semantics the oracle queries don't
isolate: direction, tolerance, ties, empty sides, grain fan-out."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_spark.operators.timeseries import (
    asof_join,
    hypertable_rollup,
    interval_join,
)


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "p1"), (1, ts(12), "p2"), (2, ts(11), "p3")],
        ["k", "lts", "name"],
    )
    right = spark.createDataFrame(
        [(1, ts(9), 100.0), (1, ts(10), 150.0), (1, ts(11, 30), 200.0),
         (3, ts(8), 999.0)],
        ["k", "rts", "px"],
    )
    return left, right


def test_asof_backward_with_tie(spark):
    left, right = _frames(spark)
    out = {
        r["name"]: (r["px"], r["rts_r"])
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts"
        ).collect()
    }
    # tie at 10:00 matches (<= semantics)
    assert out["p1"] == (150.0, ts(10))
    assert out["p2"] == (200.0, ts(11, 30))
    # key 2 has no right rows -> NULL attach (left outer)
    assert out["p3"] == (None, None)


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        r["name"]: r["px"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            direction="forward",
        ).collect()
    }
    assert out["p1"] == 150.0  # tie still matches forward
    assert out["p2"] is None  # nothing at/after 12:00
    assert out["p3"] is None


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["name"]: r["px"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            tolerance_ms=10 * 60 * 1000,
        ).collect()
    }
    assert out["p1"] == 150.0  # exact tie: gap 0
    assert out["p2"] is None  # 30 min gap > 10 min tolerance


def test_interval_join_bounds(spark):
    left, right = _frames(spark)
    out = interval_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        lower=F.expr("INTERVAL -2 HOURS"), upper=F.expr("INTERVAL 0 SECONDS"),
        how="left",
    )
    got = {
        r["name"]: r["px"]
        for r in out.collect()
    }
    # p2 at 12:00 sees 11:30 (within 2h, strictly before); upper bound
    # is exclusive so p1 at 10:00 must NOT match the 10:00 right row
    rows = out.groupBy("name").agg(
        F.count("px").alias("n")
    ).collect()
    n = {r["name"]: r["n"] for r in rows}
    assert n["p1"] == 1  # only 09:00 (10:00 excluded by open upper bound)
    assert n["p2"] == 2  # 10:00 (wait: 12-2h=10:00 inclusive) and 11:30
    assert n["p3"] == 0  # left row survives with no matches
    assert got["p3"] is None


def test_hypertable_rollup_grains(spark):
    df = spark.createDataFrame(
        [(ts(10, 15), "a", 1.0), (ts(10, 45), "a", 2.0),
         (ts(11, 5), "b", 3.0)],
        ["t", "g", "v"],
    )
    out = hypertable_rollup(
        df, ts_col="t", keys=["g"],
        aggs=[F.count(F.lit(1)).alias("n")],
        grains=("hour", "day"),
    ).collect()
    by = {(r["grain"], r["bucket_start"], r["g"]): r["n"] for r in out}
    assert by[("hour", ts(10), "a")] == 2
    assert by[("hour", ts(11), "b")] == 1
    assert by[("day", dt.datetime(2024, 1, 1), "a")] == 2
    assert by[("day", dt.datetime(2024, 1, 1), "b")] == 1
    # every input row lands in every grain exactly once
    assert sum(n for (grain, _, _), n in by.items() if grain == "hour") == 3
    assert sum(n for (grain, _, _), n in by.items() if grain == "day") == 3
