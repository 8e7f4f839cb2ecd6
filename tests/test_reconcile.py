"""Tests: reconcile (anti-entropy) + incremental aggregate merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.reconcile import (
    merge_agg_state,
    reconcile,
)


def test_reconcile_statuses(spark):
    expected = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, name string, v long",
    )
    actual = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 40), (5, "e", 50)],
        "id long, name string, v long",
    )
    out = {r["id"]: r["status"] for r in reconcile(
        expected, actual, ["id"]
    ).collect()}
    # 1 clean (absent), 2 mismatch, 3 missing, 4 clean (NULL==NULL), 5 extra
    assert out == {2: "mismatch", 3: "missing", 5: "extra"}


def test_reconcile_null_vs_value_is_mismatch(spark):
    e = spark.createDataFrame([(1, "x")], "id long, name string")
    a = spark.createDataFrame([(1, None)], "id long, name string")
    out = reconcile(e, a, ["id"]).collect()
    assert [(r["id"], r["status"]) for r in out] == [(1, "mismatch")]


def test_reconcile_compare_cols_subset(spark):
    e = spark.createDataFrame([(1, "x", 5)], "id long, name string, v long")
    a = spark.createDataFrame([(1, "y", 5)], "id long, name string, v long")
    # name differs but only v is compared -> clean
    assert reconcile(e, a, ["id"], compare_cols=["v"]).count() == 0


def test_merge_agg_state_equals_recompute(spark):
    rows = [(i % 7, i, float(i) * 1.5) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, id long, x double")

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(18,2)")).alias("s"),
        )

    full = {r["k"]: (r["n"], r["s"]) for r in agg(df).collect()}
    merged = merge_agg_state(
        agg(df.filter(F.col("id") % 2 == 0)),
        agg(df.filter(F.col("id") % 2 == 1)),
        ["k"],
        ["n", "s"],
    )
    got = {r["k"]: (r["n"], r["s"]) for r in merged.collect()}
    assert got == full


def test_merge_agg_state_associative(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "k long, v long"
    )
    a = df.filter(F.col("v") == 10).groupBy("k").agg(F.sum("v").alias("v"))
    b = df.filter(F.col("v") == 20).groupBy("k").agg(F.sum("v").alias("v"))
    c = df.filter(F.col("v") == 5).groupBy("k").agg(F.sum("v").alias("v"))
    ab_c = merge_agg_state(
        merge_agg_state(a, b, ["k"], ["v"]), c, ["k"], ["v"]
    )
    a_bc = merge_agg_state(
        a, merge_agg_state(b, c, ["k"], ["v"]), ["k"], ["v"]
    )
    assert sorted(map(tuple, ab_c.collect())) == sorted(
        map(tuple, a_bc.collect())
    ) == [(1, 30), (2, 5)]


def test_table_changes_golden(spark):
    from data_engineering_spark.operators.reconcile import table_changes

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "d", 40.0)],
        ["id", "s", "x"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        ["id", "s", "x"],
    )
    feed = {r["id"]: r for r in table_changes(old, new, ["id"]).collect()}
    assert set(feed) == {2, 3, 4, 5}  # key 1 unchanged -> silent
    assert feed[2]["__op"] == "u" and feed[2]["s"] == "B"
    assert feed[3]["__op"] == "u" and feed[3]["s"] == "c"  # NULL -> value
    assert feed[4]["__op"] == "d" and feed[4]["s"] == "d"  # before-image
    assert feed[5]["__op"] == "c" and feed[5]["x"] == 50.0


def test_table_changes_roundtrip_applies_back(spark):
    """Applying the generated feed to `old` with keep-last semantics
    reproduces `new` exactly — generation and application are inverses."""
    from data_engineering_spark.operators.merge import merge_frames
    from data_engineering_spark.operators.reconcile import table_changes

    old = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(50)], ["id", "s", "x"]
    )
    new = spark.createDataFrame(
        [(i, ("V" if i % 3 == 0 else "v") + str(i), float(i))
         for i in range(10, 60)],
        ["id", "s", "x"],
    )
    feed = table_changes(old, new, ["id"])
    # merge output columns are the union of target+source, so the feed's
    # op column rides along — drop it before comparing content
    applied = merge_frames(old, feed, ["id"], op_col="__op").drop("__op")
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_table_changes_schema_evolution(spark):
    """A column added in `new` compares vs NULL (no analysis error); a
    column dropped from `new` does not flood updates but still rides
    delete payloads as the before-image."""
    from data_engineering_spark.operators.reconcile import table_changes

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["id", "s", "legacy"],
    )
    new = spark.createDataFrame(
        [(1, "a", "x1"), (2, "B", "x2")], ["id", "s", "added"]
    )
    feed = {r["id"]: r for r in table_changes(old, new, ["id"]).collect()}
    # key 1: s unchanged, but `added` went NULL->x1 => update
    assert feed[1]["__op"] == "u" and feed[1]["added"] == "x1"
    assert feed[2]["__op"] == "u" and feed[2]["s"] == "B"
    # key 3: delete, before-image carries the dropped column's value
    assert feed[3]["__op"] == "d" and feed[3]["legacy"] == 30.0
    assert feed[3]["added"] is None


def test_table_changes_dropped_column_alone_is_silent(spark):
    """If the ONLY schema difference is a dropped column, surviving keys
    with unchanged remaining values emit nothing (no perpetual 'u')."""
    from data_engineering_spark.operators.reconcile import table_changes

    old = spark.createDataFrame([(1, "a", 9.0)], ["id", "s", "legacy"])
    new = spark.createDataFrame([(1, "a")], ["id", "s"])
    assert table_changes(old, new, ["id"]).count() == 0
