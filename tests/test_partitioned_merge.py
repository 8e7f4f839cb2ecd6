"""Partition-pruned MERGE: only touched partitions are rewritten."""

from __future__ import annotations

import glob
import os

from data_engineering_spark.operators.merge import MergeTable


def files_in(path: str, part: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, part, "*.parquet"))
    }


def mk(spark, rows):
    return spark.createDataFrame(
        rows, "id long, val string, month string, __ts_ms long, __op string"
    )


def test_partitioned_merge_only_touches_affected(spark, tmp_path):
    path = str(tmp_path / "t")
    t = MergeTable(spark, path, ["id"], partition_by="month")
    t.merge(mk(spark, [
        (1, "a", "2024-01", 100, "c"),
        (2, "b", "2024-02", 100, "c"),
        (3, "c", "2024-03", 100, "c"),
    ]))
    before_feb = files_in(path, "month=2024-02")
    before_mar = files_in(path, "month=2024-03")
    assert before_feb and before_mar

    # touch only January
    t.merge(mk(spark, [(1, "A", "2024-01", 200, "u")]))

    assert files_in(path, "month=2024-02") == before_feb
    assert files_in(path, "month=2024-03") == before_mar
    out = {r["id"]: (r["val"], r["month"]) for r in t.read().collect()}
    assert out == {1: ("A", "2024-01"), 2: ("b", "2024-02"),
                   3: ("c", "2024-03")}


def test_partition_moving_update(spark, tmp_path):
    """An update that moves a row across partitions must delete the old
    copy (the old partition is affected via the key semi-join)."""
    path = str(tmp_path / "t")
    t = MergeTable(spark, path, ["id"], partition_by="month")
    t.merge(mk(spark, [
        (1, "a", "2024-01", 100, "c"),
        (2, "b", "2024-02", 100, "c"),
    ]))
    t.merge(mk(spark, [(1, "a2", "2024-03", 200, "u")]))
    out = {r["id"]: r["month"] for r in t.read().collect()}
    assert out == {1: "2024-03", 2: "2024-02"}
    assert t.read().count() == 2  # no duplicate left in 2024-01


def test_partition_fully_deleted(spark, tmp_path):
    """Deleting every row of a partition removes its directory (dynamic
    overwrite alone would leave it stale)."""
    path = str(tmp_path / "t")
    t = MergeTable(spark, path, ["id"], partition_by="month")
    t.merge(mk(spark, [
        (1, "a", "2024-01", 100, "c"),
        (2, "b", "2024-02", 100, "c"),
    ]))
    t.merge(mk(spark, [(1, None, "2024-01", 200, "d")]))
    out = {r["id"]: r["month"] for r in t.read().collect()}
    assert out == {2: "2024-02"}
    assert not glob.glob(os.path.join(path, "month=2024-01", "*.parquet"))


def test_partitioned_delete_and_insert_same_batch(spark, tmp_path):
    path = str(tmp_path / "t")
    t = MergeTable(spark, path, ["id"], partition_by="month")
    t.merge(mk(spark, [(1, "a", "2024-01", 100, "c")]))
    t.merge(mk(spark, [
        (1, None, "2024-01", 200, "d"),
        (9, "new", "2024-01", 200, "c"),
    ]))
    out = {r["id"]: r["val"] for r in t.read().collect()}
    assert out == {9: "new"}


def test_partitioned_schema_evolution_preserves_new_columns(spark, tmp_path):
    """A widened batch touching one partition must not lose its new
    column when untouched partitions still carry the old schema."""
    path = str(tmp_path / "t")
    t = MergeTable(spark, path, ["id"], partition_by="month")
    t.merge(mk(spark, [
        (1, "a", "2024-01", 100, "c"),
        (2, "b", "2024-02", 100, "c"),
    ]))
    wide = spark.createDataFrame(
        [(3, "c", "2024-01", 0.5, 200, "c")],
        "id long, val string, month string, disc double, "
        "__ts_ms long, __op string",
    )
    t.merge(wide)
    out = {r["id"]: r for r in t.read().collect()}
    assert out[3]["disc"] == 0.5
    assert out[2]["disc"] is None  # untouched partition, old schema
    assert out[1]["disc"] is None  # rewritten partition, backfilled


def test_partitioned_empty_batch_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    t = MergeTable(spark, path, ["id"], partition_by="month")
    t.merge(mk(spark, [(1, "a", "2024-01", 100, "c")]))
    empty = mk(spark, []).limit(0)
    t.merge(empty)
    assert t.read().count() == 1


def test_concurrent_partitioned_merges_no_cross_table_damage(spark, tmp_path):
    """Regression for the session-conf race: two partitioned merges on
    DIFFERENT tables running concurrently in one SparkSession must each
    overwrite only their own touched partitions. (The old
    implementation toggled spark.sql.sources.partitionOverwriteMode on
    the shared session; a restore racing another merge's write turned
    it into a static overwrite that deleted every untouched partition.)
    """
    from concurrent.futures import ThreadPoolExecutor

    tables = []
    for name in ("ta", "tb"):
        t = MergeTable(spark, str(tmp_path / name), ["id"],
                       partition_by="month")
        t.merge(mk(spark, [
            (1, "a", "2024-01", 100, "c"),
            (2, "b", "2024-02", 100, "c"),
            (3, "c", "2024-03", 100, "c"),
        ]))
        tables.append(t)

    def touch_january(t: MergeTable, tag: str) -> None:
        for i in range(3):
            t.merge(mk(spark, [(1, f"{tag}{i}", "2024-01", 200 + i, "u")]))

    with ThreadPoolExecutor(max_workers=2) as ex:
        futs = [
            ex.submit(touch_january, t, tag)
            for t, tag in zip(tables, ("x", "y"))
        ]
        for f in futs:
            f.result()

    for t, tag in zip(tables, ("x", "y")):
        out = {r["id"]: r["val"] for r in t.read().collect()}
        # untouched partitions survived; January holds the last update
        assert out == {1: f"{tag}2", 2: "b", 3: "c"}


def test_full_touch_batch_takes_swap_path(spark, tmp_path):
    """A batch touching EVERY existing partition publishes via
    staging+swap (one table write, no full-target checkpoint) instead
    of the pruned dynamic overwrite; a subset batch keeps overwriting
    in place. Observable: the swap replaces the table directory inode,
    in-place overwrite keeps it."""
    import os

    from data_engineering_spark.operators.merge import MergeTable

    path = str(tmp_path / "t")
    t = MergeTable(spark, path, ["id"], partition_by="pt")

    def mk(rows):
        return spark.createDataFrame(
            rows, "id long, pt string, val string, __ts_ms long, __op string"
        )

    t.merge(mk([(1, "a", "v1", 100, "c"), (2, "b", "v2", 100, "c")]))
    ino_after_create = os.stat(path).st_ino

    # subset batch: only partition 'a' touched -> in-place dynamic
    # overwrite, directory inode survives
    t.merge(mk([(1, "a", "v1b", 200, "u")]))
    assert os.stat(path).st_ino == ino_after_create

    # full-touch batch: both partitions -> staging+swap, new inode
    t.merge(mk([(1, "a", "v1c", 300, "u"), (3, "b", "v3", 300, "c")]))
    assert os.stat(path).st_ino != ino_after_create

    got = sorted((r["id"], r["pt"], r["val"]) for r in t.read().collect())
    assert got == [(1, "a", "v1c"), (2, "b", "v2"), (3, "b", "v3")]
