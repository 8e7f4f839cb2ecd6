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


def test_kmv_pairwise_accuracy(spark):
    """Estimates from 256-hash sketches stay within ~3 standard errors
    of exact union/Jaccard on planted overlapping sets."""
    from pyspark.sql import functions as F

    from data_engineering_spark.operators.sketches import (
        kmv_pairwise,
        kmv_sketch,
    )

    # A = [0, 4000), B = [2000, 8000): union 8000, jaccard 2000/8000
    a = spark.range(0, 4000).select(
        F.lit("A").alias("s"), F.col("id").alias("v"))
    b = spark.range(2000, 8000).select(
        F.lit("B").alias("s"), F.col("id").alias("v"))
    df = a.unionByName(b)
    out = kmv_pairwise(kmv_sketch(df, "s", "v", k=256), "s", k=256).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r["union_est"] - 8000) / 8000 < 0.2
    assert abs(r["jaccard_est"] - 0.25) < 0.1
    assert abs(r["intersect_est"] - 2000) / 2000 < 0.45


def test_kmv_pairwise_small_sets_exact(spark):
    """Below k the sketches are exhaustive: estimates are exact."""
    from pyspark.sql import functions as F

    from data_engineering_spark.operators.sketches import (
        kmv_pairwise,
        kmv_sketch,
    )

    a = spark.range(0, 30).select(F.lit("A").alias("s"), F.col("id").alias("v"))
    b = spark.range(20, 50).select(F.lit("B").alias("s"), F.col("id").alias("v"))
    r = kmv_pairwise(
        kmv_sketch(a.unionByName(b), "s", "v", k=64), "s", k=64
    ).collect()[0]
    assert r["union_est"] == 50.0
    assert r["jaccard_est"] == 10 / 50
    assert r["intersect_est"] == 10.0


def test_kmv_rolling_distinct_tracks_exact(spark, sf_dir):
    """Merged per-day sketches estimate trailing-7-day distinct users
    within the k=256 error envelope of the exact grid-join answer."""
    from pyspark.sql import functions as F

    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.sketches import (
        kmv_rolling_distinct,
    )

    e = load_table(spark, "/root/testdata/sf0.01", "events")
    est = {
        r["day"]: r["est_distinct"]
        for r in kmv_rolling_distinct(
            e, F.date_trunc("day", "ts").cast("date"), "user_id",
            window_days=7, k=256,
        ).collect()
    }
    du = e.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select(F.col("day").alias("d")).distinct()
    exact = {
        r["d"]: r["n"]
        for r in days.join(
            du,
            (F.col("day") <= F.col("d"))
            & (F.col("day") > F.date_sub(F.col("d"), 7)),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for d, n in exact.items():
        if n < 256:
            assert est[d] == float(n)  # sub-k sketches are exact
        else:
            assert abs(est[d] - n) / n < 0.25
