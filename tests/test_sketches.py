"""KMV sketch: estimation-error bounds vs exact distinct counts, and
the exact-below-k fast path."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.sketches import kmv_distinct


def test_kmv_exact_when_under_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)], ["g", "v"]
    )
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row["n_kept"] == 10
    assert row["est_distinct"] == 10.0  # < k distinct -> exact


def test_kmv_error_bound(spark):
    # 5000 distinct values, k=64 -> stderr ~ 1/sqrt(62) ~ 12.7%;
    # assert within 4 sigma (~50%) to be flake-proof while still
    # catching a broken estimator (off by 2x+ or constant).
    n = 5000
    df = spark.createDataFrame([("a", i) for i in range(n)], ["g", "v"])
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row["n_kept"] == 64
    assert 0.5 * n < row["est_distinct"] < 1.5 * n


def test_kmv_merge_equivalence(spark):
    # sketching a union == sketching the parts then merging: the k
    # smallest of the union are the k smallest of the combined minima.
    # (The operator computes on the union directly; this asserts the
    # mergeability property that makes it shuffle-safe.)
    a = spark.createDataFrame([("g", i) for i in range(0, 3000)], ["g", "v"])
    b = spark.createDataFrame(
        [("g", i) for i in range(1500, 4000)], ["g", "v"]
    )
    whole = kmv_distinct(a.union(b), ["g"], "v", k=64).collect()[0]
    # distinct of union = 4000
    assert whole["n_kept"] == 64
    assert 0.5 * 4000 < whole["est_distinct"] < 1.5 * 4000
    # determinism: same data -> identical estimate
    again = kmv_distinct(b.union(a), ["g"], "v", k=64).collect()[0]
    assert again["est_distinct"] == whole["est_distinct"]
