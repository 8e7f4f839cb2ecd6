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
