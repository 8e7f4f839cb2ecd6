"""File-ledger incremental ingestion (sources/incremental)."""

from __future__ import annotations

from data_engineering_spark.sources.incremental import FileLedger


def _drop(spark, directory, name, rows):
    spark.createDataFrame([(r,) for r in rows], "v long").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{directory}/{name}")


def _paths(files):
    return [f.path for f in files]


def test_ledger_sees_each_file_once(spark, tmp_path):
    land = str(tmp_path / "landing")
    ledger = FileLedger(spark, str(tmp_path / "ledger"))

    _drop(spark, land, "a", [1, 2])
    _drop(spark, land, "b", [3])
    first = ledger.new_files(land, suffix=".parquet")
    assert len(first) == 2  # one data file per drop dir
    got = spark.read.parquet(*_paths(first))
    assert sorted(r["v"] for r in got.collect()) == [1, 2, 3]
    ledger.commit(first)

    # nothing new -> empty batch; new drop -> only the new file
    assert ledger.new_files(land, suffix=".parquet") == []
    _drop(spark, land, "c", [9])
    second = ledger.new_files(land, suffix=".parquet")
    assert len(second) == 1
    assert sorted(
        r["v"] for r in spark.read.parquet(*_paths(second)).collect()
    ) == [9]
    ledger.commit(second)
    assert ledger.next_batch_id() == 2


def test_crash_before_commit_represents_files(spark, tmp_path):
    """At-least-once: an uncommitted batch reappears on the next run."""
    land = str(tmp_path / "landing2")
    ledger = FileLedger(spark, str(tmp_path / "ledger2"))
    _drop(spark, land, "a", [1])
    batch = ledger.new_files(land, suffix=".parquet")
    assert len(batch) == 1
    # crash here (no commit): a fresh ledger instance re-lists it
    again = FileLedger(spark, str(tmp_path / "ledger2")).new_files(
        land, suffix=".parquet"
    )
    assert _paths(again) == _paths(batch)


def test_hidden_and_missing_dirs(spark, tmp_path):
    ledger = FileLedger(spark, str(tmp_path / "ledger3"))
    assert ledger.new_files(str(tmp_path / "nope")) == []
    land = str(tmp_path / "landing3")
    _drop(spark, land, "a", [1])
    files = ledger.new_files(land)
    # parquet writes emit _SUCCESS etc. — hidden names never surface
    assert all(
        not p.rsplit("/", 1)[1].startswith(("_", ".")) for p in _paths(files)
    )


def test_landing_zone_cdc_end_to_end(spark, tmp_path):
    """Kafka-less CDC: upstream drops envelope parquet into a landing
    dir; each run = ledger.new_files -> process_batch -> commit.
    Exactly-once per file, and a crash-replayed file converges to the
    same table state (keyed MERGE idempotence)."""
    from cdc_fixtures import envelope_frame, sale

    from data_engineering_spark.cdc.pipeline import CdcEngine, LakeConfig

    land = str(tmp_path / "cdc_landing")
    engine = CdcEngine(spark, LakeConfig(root=str(tmp_path / "lake")))
    ledger = FileLedger(spark, str(tmp_path / "cdc_ledger"))

    envelope_frame(spark, [
        sale(spark, 1, 10, 9.99), sale(spark, 2, 20, 19.99),
    ]).write.parquet(f"{land}/batch-000")
    envelope_frame(spark, [
        sale(spark, 2, 21, 21.00, op="u", ts_ms=1_700_000_000_100),
        sale(spark, 3, 30, 5.00, ts_ms=1_700_000_000_100),
    ]).write.parquet(f"{land}/batch-001")

    def run_once():
        batch = ledger.new_files(land, suffix=".parquet")
        if batch:
            engine.process_batch(
                spark.read.parquet(*[f.path for f in batch])
            )
            ledger.commit(batch)
        return len(batch)

    n_first = run_once()
    assert n_first > 0
    got = {
        r["sale_id"]: r["item_id"]
        for r in engine.tables["sales"].read().collect()
    }
    assert got == {1: 10, 2: 21, 3: 30}

    # no new files -> no-op run
    assert run_once() == 0

    # crash simulation: re-present batch-001 (ledger rolled back) —
    # replay converges to the identical state
    import shutil

    shutil.rmtree(str(tmp_path / "cdc_ledger"))
    assert run_once() == n_first
    got2 = {
        r["sale_id"]: r["item_id"]
        for r in engine.tables["sales"].read().collect()
    }
    assert got2 == got
