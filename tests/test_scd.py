"""SCD Type 2 operator semantics (operators/scd.py).

Golden cases on tiny hand-built change streams; the sf-scale oracle
parity lives in tests/test_oracle_parity.py via the q_scd2_* queries.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_engineering_spark.operators.scd import (
    scd2_as_of,
    scd2_build,
    scd2_merge,
)


def _changes(spark, rows):
    return spark.createDataFrame(
        [(k, v, datetime(2024, 1, d), i) for i, (k, v, d) in enumerate(rows)],
        "k string, val string, ts timestamp, seq long",
    )


def _hist(df):
    return sorted(
        (
            (
                r.k,
                r.val,
                r.valid_from.day,
                r.valid_to.day if r.valid_to else None,
                r.is_current,
                r.version,
            )
            for r in df.collect()
        ),
        key=lambda t: (t[0], t[5]),  # (key, version): total, None-safe
    )


def test_build_suppresses_noop_changes(spark):
    ch = _changes(
        spark,
        [("a", "x", 1), ("a", "x", 2), ("a", "y", 3), ("a", "y", 4), ("a", "x", 5)],
    )
    out = scd2_build(ch, ["k"], ["val"], "ts", order_cols=["seq"])
    assert _hist(out) == [
        ("a", "x", 1, 3, False, 1),  # day-2 repeat suppressed
        ("a", "y", 3, 5, False, 2),  # day-4 repeat suppressed
        ("a", "x", 5, None, True, 3),
    ]


def test_build_null_safe_suppression(spark):
    ch = _changes(spark, [("a", None, 1), ("a", None, 2), ("a", "x", 3)])
    out = scd2_build(ch, ["k"], ["val"], "ts", order_cols=["seq"])
    assert _hist(out) == [
        ("a", None, 1, 3, False, 1),  # NULL == NULL: suppressed
        ("a", "x", 3, None, True, 2),
    ]


def test_merge_equals_full_rebuild(spark):
    rows = [
        ("a", "x", 1), ("a", "y", 5), ("a", "y", 22), ("a", "z", 25),
        ("b", "p", 2), ("b", "p", 23),  # delta change fully suppressed
        ("c", "q", 21),  # key born in the delta
    ]
    ch = _changes(spark, rows)
    full = scd2_build(ch, ["k"], ["val"], "ts", order_cols=["seq"])
    cut = F.lit(datetime(2024, 1, 20))
    state = scd2_build(
        ch.filter(F.col("ts") < cut), ["k"], ["val"], "ts", order_cols=["seq"]
    )
    merged = scd2_merge(
        state,
        ch.filter(F.col("ts") >= cut),
        ["k"],
        ["val"],
        "ts",
        order_cols=["seq"],
    )
    assert _hist(merged) == _hist(full)


def test_merge_untouched_keys_pass_through(spark):
    ch = _changes(spark, [("a", "x", 1), ("b", "y", 2)])
    state = scd2_build(ch, ["k"], ["val"], "ts", order_cols=["seq"])
    delta = _changes(spark, [("b", "z", 25)])
    merged = scd2_merge(
        state, delta, ["k"], ["val"], "ts", order_cols=["seq"]
    )
    a_rows = [r for r in _hist(merged) if r[0] == "a"]
    assert a_rows == [("a", "x", 1, None, True, 1)]
    b_rows = [r for r in _hist(merged) if r[0] == "b"]
    assert b_rows == [
        ("b", "y", 2, 25, False, 1),
        ("b", "z", 25, None, True, 2),
    ]


def test_as_of_boundaries(spark):
    ch = _changes(spark, [("a", "x", 1), ("a", "y", 10)])
    dim = scd2_build(ch, ["k"], ["val"], "ts", order_cols=["seq"])
    # at the instant a version opens, it is the valid one (>= from, < to)
    at_open = scd2_as_of(dim, "2024-01-10 00:00:00").collect()
    assert [(r.k, r.val) for r in at_open] == [("a", "y")]
    before = scd2_as_of(dim, "2024-01-09 23:59:59").collect()
    assert [(r.k, r.val) for r in before] == [("a", "x")]
    # before the first version: no row
    assert scd2_as_of(dim, "2023-12-31 00:00:00").count() == 0
