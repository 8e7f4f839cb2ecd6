"""Misra-Gries two-phase heavy hitters (operators/sketches.py):
exactness against brute-force counting under adversarial layouts."""

from __future__ import annotations

from collections import Counter

from data_engineering_spark.operators.sketches import heavy_hitters


def _check(spark, values, phi, n_partitions=8):
    df = spark.createDataFrame(
        [(v,) for v in values], "x string"
    ).repartition(n_partitions)
    got = {
        r.value: r.cnt for r in heavy_hitters(df, "x", phi).collect()
    }
    counts = Counter(values)
    want = {
        v: c for v, c in counts.items() if c >= phi * len(values)
    }
    assert got == want


def test_single_heavy_among_unique_noise(spark):
    # 200 copies of one value drowned in 1800 singletons, spread over
    # partitions — the exact shape where naive per-partition top-k by
    # count can miss; MG's guarantee must not
    vals = ["hot"] * 200 + [f"u{i}" for i in range(1800)]
    _check(spark, vals, phi=0.05)


def test_boundary_exact_threshold(spark):
    # value at EXACTLY phi*N must be kept (>= semantics)
    vals = ["edge"] * 10 + [f"u{i}" for i in range(90)]
    _check(spark, vals, phi=0.10)


def test_several_heavies_and_empty_result(spark):
    vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 20 + [f"u{i}" for i in range(100)]
    _check(spark, vals, phi=0.10)
    # phi so high nothing qualifies -> empty, not an error
    _check(spark, vals, phi=0.5)


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 20, "x string"
    )
    got = heavy_hitters(df, "x", 0.1).collect()
    # N counts all rows (25); 'a' has 5 >= 2.5 -> kept; NULLs never
    # become a value
    assert {(r.value, r.cnt) for r in got} == {("a", 5)}
