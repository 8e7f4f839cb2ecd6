"""Merge-on-read backend: state equivalence with the copy-on-write
MergeTable across batch sequences, both late-event modes, schema
evolution, and compaction invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.merge import MergeTable, MergeTableMOR


def batch(spark, rows, cols=("id", "val", "__ts_ms", "__op")):
    return spark.createDataFrame(rows, list(cols))


BATCHES = [
    [(1, "a1", 100, "c"), (2, "b1", 100, "c"), (3, "c1", 100, "c")],
    [(1, "a2", 200, "u"), (2, None, 200, "d"), (4, "d1", 200, "c")],
    [(2, "b3", 300, "c"), (3, "c3", 50, "u")],  # re-create + LATE update
]


def state(df):
    return sorted(
        (r["id"], r["val"], r["__ts_ms"]) for r in df.collect()
    )


def run_cow(spark, tmp_path, ts_guard):
    t = MergeTable(spark, str(tmp_path / f"cow_{ts_guard}"), ["id"])
    for rows in BATCHES:
        t.merge(batch(spark, rows), ts_guard=ts_guard)
    return state(t.read())


def run_mor(spark, tmp_path, ts_guard, compact_at=None):
    t = MergeTableMOR(
        spark, str(tmp_path / f"mor_{ts_guard}_{compact_at}"), ["id"],
        ts_guard=ts_guard,
    )
    for i, rows in enumerate(BATCHES):
        t.merge(batch(spark, rows))
        if compact_at is not None and i == compact_at:
            t.compact()
    return state(t.read())


def test_mor_equals_cow_reference_mode(spark, tmp_path):
    """ts_guard=False (reference parity): later batch wins even with an
    older __ts_ms — id 3's late update applies."""
    cow = run_cow(spark, tmp_path, False)
    assert run_mor(spark, tmp_path, False) == cow
    assert (3, "c3", 50) in cow  # the late event DID overwrite


def test_mor_equals_cow_ts_guard(spark, tmp_path):
    """ts_guard=True: newer-wins — id 3 keeps ts 100; id 2's delete at
    200 loses to the re-create at 300."""
    cow = run_cow(spark, tmp_path, True)
    assert run_mor(spark, tmp_path, True) == cow
    assert (3, "c1", 100) in cow


def test_mor_compaction_is_invisible(spark, tmp_path):
    """Compacting mid-stream (folding deltas into the base) must not
    change any observable state, and clears the delta dir."""
    plain = run_mor(spark, tmp_path, False)
    for at in (0, 1, 2):
        assert run_mor(spark, tmp_path, False, compact_at=at) == plain
    t = MergeTableMOR(spark, str(tmp_path / "mor_False_2"), ["id"])
    assert t.delta_count() == 0  # compact at the last batch cleared all


def test_mor_schema_evolution_backfill(spark, tmp_path):
    """A delta introducing a new column NULL-back-fills rows whose
    winner predates it — same as COW's merge_frames."""
    t = MergeTableMOR(spark, str(tmp_path / "mor_evo"), ["id"])
    t.merge(batch(spark, [(1, "a", 100, "c"), (2, "b", 100, "c")]))
    t.merge(
        batch(
            spark,
            [(2, "b2", 200, "u", "extra2")],
            cols=("id", "val", "__ts_ms", "__op", "extra"),
        )
    )
    got = {
        r["id"]: (r["val"], r["extra"]) for r in t.read().collect()
    }
    assert got == {1: ("a", None), 2: ("b2", "extra2")}
    t.compact()
    got2 = {
        r["id"]: (r["val"], r["extra"]) for r in t.read().collect()
    }
    assert got2 == got


def test_mor_write_cost_is_one_delta_file(spark, tmp_path):
    """The MOR contract: a merge writes exactly one new delta dir and
    never touches the base."""
    import os

    t = MergeTableMOR(spark, str(tmp_path / "mor_cost"), ["id"])
    t.merge(batch(spark, [(1, "a", 100, "c")]))
    base_mtime = os.path.getmtime(t.base_path)
    for i in range(3):
        t.merge(batch(spark, [(1, f"u{i}", 200 + i, "u")]))
    assert t.delta_count() == 3
    assert os.path.getmtime(t.base_path) == base_mtime
    assert state(t.read()) == [(1, "u2", 202)]


def test_cdc_backend_equivalence(spark, tmp_path):
    """The full CDC pipeline (envelope parse, LWW, tenant stamping,
    quarantine) produces identical table state under the COW and MOR
    backends across an insert/update/delete lifecycle."""
    from data_engineering_spark.cdc.pipeline import CdcEngine, LakeConfig
    from tests.cdc_fixtures import envelope_frame, sale

    batches = [
        [sale(spark, 1, 10, 9.99, op="c", ts_ms=1000),
         sale(spark, 2, 20, 19.99, op="c", ts_ms=1001)],
        [sale(spark, 1, 11, 10.99, op="u", ts_ms=2000),
         sale(spark, 2, 20, 19.99, op="d", ts_ms=2001),
         sale(spark, 3, 30, 5.0, op="c", ts_ms=2002)],
        [sale(spark, 3, 31, 6.0, op="u", ts_ms=1500)],  # late event
    ]
    states = {}
    for backend in ("cow", "mor"):
        eng = CdcEngine(
            spark,
            LakeConfig(root=str(tmp_path / backend), backend=backend),
        )
        for rows in batches:
            eng.process_batch(envelope_frame(spark, rows))
        df = eng.tables["sales"].read()
        states[backend] = sorted(
            (r["sale_id"], r["item_id"], r["price"], r["__op"])
            for r in df.collect()
        )
    assert states["cow"] == states["mor"]
    # reference semantics: the late (older-ts) update still applied
    assert (3, 31, 6.0, "u") in states["cow"]


def test_mor_time_travel(spark, tmp_path):
    """as_of=k replays the first k deltas; history is a prefix of the
    same append-only log, and replaying version-by-version matches a
    fresh table fed the same batch prefix."""
    t = MergeTableMOR(spark, str(tmp_path / "tt"), ["id"])
    for rows in BATCHES:
        t.merge(batch(spark, rows))
    assert t.versions() == [0, 1, 2]
    # v0 = base (batch 1 inserts only)
    assert state(t.read(as_of=0)) == [
        (1, "a1", 100), (2, "b1", 100), (3, "c1", 100)]
    # v1 = after batch 2: id1 updated, id2 deleted, id4 created
    assert state(t.read(as_of=1)) == [
        (1, "a2", 200), (3, "c1", 100), (4, "d1", 200)]
    # newest version == unqualified read
    assert state(t.read(as_of=2)) == state(t.read())
    import pytest
    with pytest.raises(ValueError):
        t.read(as_of=3)


def test_mor_change_feed(spark, tmp_path):
    t = MergeTableMOR(spark, str(tmp_path / "cf"), ["id"])
    for rows in BATCHES:
        t.merge(batch(spark, rows))
    # (1, 2]: the single delta that advances v1 -> v2, i.e. batch 3
    feed = t.change_feed(1, 2).collect()
    assert {r["_commit_version"] for r in feed} == {2}
    assert sorted((r["id"], r["__op"]) for r in feed) == [
        (2, "c"), (3, "u")]
    # (0, 1]: batch 2's rows
    feed01 = t.change_feed(0, 1).collect()
    assert {r["_commit_version"] for r in feed01} == {1}
    assert sorted((r["id"], r["__op"]) for r in feed01) == [
        (1, "u"), (2, "d"), (4, "c")]
    # full feed covers both deltas; empty range yields empty frame
    assert {r["_commit_version"] for r in t.change_feed(0).collect()} == {1, 2}
    assert t.change_feed(1, 1).count() == 0


def test_mor_auto_compaction_bounds_delta_count(spark, tmp_path):
    """VERDICT r4 #8: a long MOR ingest loop must keep delta_count()
    bounded by the auto-compact threshold (the engine compacts on the
    write path once the threshold is crossed), with table state
    identical to an uncompacted MOR run fed the same batches."""
    from data_engineering_spark.cdc.pipeline import CdcEngine, LakeConfig
    from tests.cdc_fixtures import envelope_frame, sale

    thr = 4
    auto = CdcEngine(
        spark,
        LakeConfig(
            root=str(tmp_path / "auto"),
            backend="mor",
            auto_compact_deltas=thr,
        ),
    )
    manual = CdcEngine(
        spark,
        LakeConfig(
            root=str(tmp_path / "manual"),
            backend="mor",
            auto_compact_deltas=None,
        ),
    )
    max_seen = 0
    for i in range(12):
        rows = [
            sale(spark, i % 5, i, float(i), op="u", ts_ms=1000 + i),
            sale(spark, 100 + i, i, 0.5, op="c", ts_ms=1000 + i),
        ]
        for eng in (auto, manual):
            eng.process_batch(envelope_frame(spark, rows))
        max_seen = max(max_seen, auto.tables["sales"].delta_count())
    assert max_seen <= thr  # bounded under the long loop
    assert auto.tables["sales"].delta_count() < 12
    assert manual.tables["sales"].delta_count() == 11  # 12 batches: 1 base + 11 deltas

    def state(eng):
        return sorted(
            (r["sale_id"], r["item_id"], r["price"], r["__op"])
            for r in eng.tables["sales"].read().collect()
        )

    assert state(auto) == state(manual)


def test_mor_lookup_matches_read_filter(spark, tmp_path):
    """lookup() (semi-join BELOW the LWW resolution) must equal the
    naive read-everything-then-filter, including deleted and absent
    keys, in both late-event modes."""
    for ts_guard in (False, True):
        t = MergeTableMOR(
            spark,
            str(tmp_path / f"l_{ts_guard}"),
            ["id"],
            ts_guard=ts_guard,
        )
        for rows in BATCHES:
            t.merge(batch(spark, rows))
        keys = spark.createDataFrame(
            [(1,), (2,), (3,), (99,)], "id long"
        )
        got = state(t.lookup(keys))
        want = [
            r
            for r in state(t.read())
            if r[0] in (1, 2, 3, 99)
        ]
        assert got == want
        import pytest as _pytest

        with _pytest.raises(ValueError, match="missing key columns"):
            t.lookup(spark.createDataFrame([("x",)], "other string"))


def test_guard_mode_delete_resets_ts_floor(spark, tmp_path):
    """Pinned divergence probe: after a winning delete, a later batch's
    OLDER-ts insert must recreate the key (COW MERGE sequential
    semantics: NOT MATCHED -> INSERT). A global keep-last-by-ts lets
    the dead row's higher ts suppress the insert — the bug the
    seq-ordered fold resolution fixes."""
    seq = [
        [(1, "a", 100, "c")],
        [(1, "x", 100, "d")],  # ts tie: source wins, key deleted
        [(1, "late", 50, "u")],  # older ts, but key is absent now
    ]
    cow = MergeTable(spark, str(tmp_path / "cow"), ["id"])
    mor = MergeTableMOR(spark, str(tmp_path / "mor"), ["id"], ts_guard=True)
    for rows in seq:
        cow.merge(batch(spark, rows), ts_guard=True)
        mor.merge(batch(spark, rows))
    want = [(1, "late", 50)]
    assert state(cow.read()) == want
    assert state(mor.read()) == want
