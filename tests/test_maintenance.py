"""Maintenance: small-file compaction + orphan cleanup."""

from __future__ import annotations

import glob
import os

from data_engineering_spark.operators.maintenance import (
    compact_table,
    data_file_sizes,
    iceberg_maintenance_sql,
    remove_orphans,
)


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(10_000).repartition(24).write.parquet(path)
    n_before = len(data_file_sizes(path))
    assert n_before >= 24

    assert compact_table(spark, path) is True
    n_after = len(data_file_sizes(path))
    assert n_after < n_before
    assert spark.read.parquet(path).count() == 10_000
    # idempotent: already compact → no-op
    assert compact_table(spark, path) is False


def test_remove_orphans(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "t.old-abc"))
    os.makedirs(os.path.join(root, "t.compact-def"))
    os.makedirs(os.path.join(root, "t"))
    assert remove_orphans(root) == 2
    assert glob.glob(os.path.join(root, "*.old-*")) == []
    assert os.path.isdir(os.path.join(root, "t"))


def test_iceberg_maintenance_sql():
    stmts = iceberg_maintenance_sql("lake", "db.sales")
    assert any("rewrite_data_files" in s and "536870912" in s for s in stmts)
    assert any("expire_snapshots" in s for s in stmts)
    assert any("remove_orphan_files" in s for s in stmts)


def test_lake_inventory(spark, tmp_path):
    from data_engineering_spark.operators.maintenance import lake_inventory
    from data_engineering_spark.operators.merge import MergeTable

    root = str(tmp_path / "lake")
    t1 = MergeTable(spark, f"{root}/sales", ["id"])
    t1.merge(spark.createDataFrame(
        [(1, "a", 1, "c"), (2, "b", 2, "c")],
        "id long, v string, __ts_ms long, __op string"))
    t2 = MergeTable(spark, f"{root}/users", ["id"], partition_by="p")
    t2.merge(spark.createDataFrame(
        [(1, 1, 1, "c"), (2, 2, 2, "c")],
        "id long, p int, __ts_ms long, __op string"))
    import os
    os.makedirs(f"{root}/_quarantine")  # hidden dirs excluded

    inv = {r["table"]: r for r in lake_inventory(spark, root).collect()}
    assert set(inv) == {"sales", "users"}
    assert inv["sales"]["n_files"] >= 1
    assert inv["sales"]["total_bytes"] > 0
    assert inv["sales"]["n_columns"] == 4
    assert inv["users"]["partition_cols"] == "p"
    assert inv["sales"]["partition_cols"] is None
