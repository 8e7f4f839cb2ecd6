"""Model-based property test: the three storage backends (flat COW,
bucketed COW, MOR) must agree with each other AND with a sequential
python LWW model under arbitrary generated batch sequences — layout
and write strategy are implementation, the merge algebra is the spec."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_spark.operators.merge import MergeTable, MergeTableMOR

_EVENT = st.tuples(
    st.integers(min_value=0, max_value=5),          # key
    st.sampled_from(["a", "b", "c", "dd", ""]),     # value
    st.integers(min_value=0, max_value=9),          # ts
    st.sampled_from(["c", "u", "d"]),               # op
)
_BATCHES = st.lists(
    st.lists(_EVENT, min_size=1, max_size=6), min_size=1, max_size=3
)


def _py_lww(batches):
    """Sequential model, reference semantics (ts_guard=False): within a
    batch the last (ts, arrival-order) event per key wins; across
    batches the later batch wins unconditionally; a winning delete
    removes the key."""
    state: dict[int, tuple[str, int]] = {}
    for batch in batches:
        compacted: dict[int, tuple[int, str, int, str]] = {}
        for seq, (k, v, ts, op) in enumerate(batch):
            cur = compacted.get(k)
            if cur is None or (ts, seq) >= (cur[0], cur[3]):
                compacted[k] = (ts, v, op, seq)
        for k, (ts, v, op, _seq) in compacted.items():
            if op == "d":
                state.pop(k, None)
            else:
                state[k] = (v, ts)
    return sorted((k, v, ts) for k, (v, ts) in state.items())


def _spark_batch(spark, batch):
    from data_engineering_spark.operators.dedup import keep_last

    df = spark.createDataFrame(
        [
            (k, v, ts, op, seq)
            for seq, (k, v, ts, op) in enumerate(batch)
        ],
        "id long, val string, __ts_ms long, __op string, __seq long",
    )
    # the CDC pipeline's pre-compaction contract: one row per key,
    # last (ts, arrival) wins
    return keep_last(df, ["id"], "__ts_ms", tiebreakers=["__seq"]).drop(
        "__seq"
    )


def _state(table):
    # deletes-only histories legitimately never create the table
    # (the zero-file-parquet guard); that IS the empty state
    if not table.exists():
        return []
    return sorted(
        (r["id"], r["val"], r["__ts_ms"]) for r in table.read().collect()
    )


@given(_BATCHES)
@settings(max_examples=6, deadline=None)
def test_three_backends_match_python_model(spark, batches):
    work = tempfile.mkdtemp(prefix="backend_props_")
    try:
        flat = MergeTable(spark, f"{work}/flat", ["id"])
        buck = MergeTable(spark, f"{work}/buck", ["id"], bucket_by=4)
        mor = MergeTableMOR(spark, f"{work}/mor", ["id"])
        for batch in batches:
            b = _spark_batch(spark, batch).localCheckpoint()
            flat.merge(b)
            buck.merge(b)
            mor.merge(b)
        want = _py_lww(batches)
        assert _state(flat) == want
        assert _state(buck) == want
        assert _state(mor) == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _py_lww_guard(batches):
    """Guard-mode model (ts_guard=True): an event applies iff the key
    is absent OR its ts >= the STORED row's ts; a winning delete clears
    the key AND its ts floor (COW MERGE sequential semantics)."""
    state: dict[int, tuple[str, int]] = {}
    for batch in batches:
        compacted: dict[int, tuple[int, str, str, int]] = {}
        for seq, (k, v, ts, op) in enumerate(batch):
            cur = compacted.get(k)
            if cur is None or (ts, seq) >= (cur[0], cur[3]):
                compacted[k] = (ts, v, op, seq)
        for k, (ts, v, op, _seq) in compacted.items():
            if k in state and ts < state[k][1]:
                continue
            if op == "d":
                state.pop(k, None)
            else:
                state[k] = (v, ts)
    return sorted((k, v, ts) for k, (v, ts) in state.items())


@given(_BATCHES)
@settings(max_examples=6, deadline=None)
def test_guard_mode_backends_match_python_model(spark, batches):
    """ts_guard=True: COW's sequential MERGE replay and MOR's
    seq-ordered fold resolution must both equal the guard model —
    including delete-then-older-insert histories, where a global
    keep-last-by-ts provably diverges."""
    work = tempfile.mkdtemp(prefix="backend_guard_props_")
    try:
        flat = MergeTable(spark, f"{work}/flat", ["id"])
        buck = MergeTable(spark, f"{work}/buck", ["id"], bucket_by=4)
        mor = MergeTableMOR(
            spark, f"{work}/mor", ["id"], ts_guard=True
        )
        for batch in batches:
            b = _spark_batch(spark, batch).localCheckpoint()
            flat.merge(b, ts_guard=True)
            buck.merge(b, ts_guard=True)
            mor.merge(b)
        want = _py_lww_guard(batches)
        assert _state(flat) == want
        assert _state(buck) == want
        assert _state(mor) == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


@given(_BATCHES)
@settings(max_examples=5, deadline=None)
def test_time_travel_replays_model_prefixes(spark, batches):
    """MOR time travel: read(as_of=k) must equal the model applied to
    the batch PREFIX that version k saw — for every readable version.
    (The first batch folds into the base, so version 0 already
    reflects batch 1's inserts; deltas start at batch 2.)"""
    work = tempfile.mkdtemp(prefix="backend_tt_props_")
    try:
        mor = MergeTableMOR(spark, f"{work}/mor", ["id"])
        for batch in batches:
            mor.merge(_spark_batch(spark, batch).localCheckpoint())
        if not mor.exists():
            assert _py_lww(batches) == []
            return
        # leading all-delete batches never create the table (the
        # zero-file guard), so version 0 corresponds to the FIRST batch
        # with a surviving insert, and version v to that batch plus the
        # v batches after it
        def _has_insert(batch):
            compacted = {}
            for seq, (k, v_, ts, op) in enumerate(batch):
                cur = compacted.get(k)
                if cur is None or (ts, seq) >= (cur[0], cur[1]):
                    compacted[k] = (ts, seq, op)
            return any(op != "d" for _, _, op in compacted.values())

        first = next(i for i, b in enumerate(batches) if _has_insert(b))
        for v in mor.versions():
            got = sorted(
                (r["id"], r["val"], r["__ts_ms"])
                for r in mor.read(as_of=v).collect()
            )
            assert got == _py_lww(batches[: first + v + 1]), (v, batches)
    finally:
        shutil.rmtree(work, ignore_errors=True)


_EVO_BATCHES = st.lists(
    st.tuples(
        st.lists(_EVENT, min_size=1, max_size=5),
        st.booleans(),  # this batch carries the evolved column
    ),
    min_size=1,
    max_size=3,
)


def _py_lww_evolved(batches):
    """Reference-mode model with schema evolution: a batch may carry an
    extra `note` column. Retention rule (Delta UPDATE SET * / COW
    merge_frames.pick): a winning upsert whose schema LACKS the column
    keeps the stored row's value; a fresh insert from an old-schema
    batch reads back NULL."""
    state: dict[int, tuple[str, object, int]] = {}
    for batch, has_note in batches:
        compacted: dict[int, tuple[int, str, str, int]] = {}
        for seq, (k, v, ts, op) in enumerate(batch):
            cur = compacted.get(k)
            if cur is None or (ts, seq) >= (cur[0], cur[3]):
                compacted[k] = (ts, v, op, seq)
        for k, (ts, v, op, _seq) in compacted.items():
            if op == "d":
                state.pop(k, None)
            elif has_note:
                state[k] = (v, f"n{v}", ts)
            else:
                prior = state.get(k)
                state[k] = (v, prior[1] if prior else None, ts)
    return sorted((k, v, n, ts) for k, (v, n, ts) in state.items())


def _spark_evolved_batch(spark, batch, has_note):
    from data_engineering_spark.operators.dedup import keep_last

    if has_note:
        rows = [
            (k, v, f"n{v}", ts, op, seq)
            for seq, (k, v, ts, op) in enumerate(batch)
        ]
        schema = (
            "id long, val string, note string, __ts_ms long, "
            "__op string, __seq long"
        )
    else:
        rows = [
            (k, v, ts, op, seq)
            for seq, (k, v, ts, op) in enumerate(batch)
        ]
        schema = "id long, val string, __ts_ms long, __op string, __seq long"
    df = spark.createDataFrame(rows, schema)
    return keep_last(df, ["id"], "__ts_ms", tiebreakers=["__seq"]).drop(
        "__seq"
    )


@given(_EVO_BATCHES)
@settings(max_examples=5, deadline=None)
def test_schema_evolution_backends_match_model(spark, batches):
    """Mid-sequence column addition: COW (mergeSchema + widened
    rewrite) and MOR (unionByName back-fill) must both read back the
    model's state with NULLs exactly where old-schema rows won."""
    work = tempfile.mkdtemp(prefix="backend_evo_props_")
    try:
        flat = MergeTable(spark, f"{work}/flat", ["id"])
        buck = MergeTable(spark, f"{work}/buck", ["id"], bucket_by=4)
        mor = MergeTableMOR(spark, f"{work}/mor", ["id"])
        for batch, has_note in batches:
            b = _spark_evolved_batch(
                spark, batch, has_note
            ).localCheckpoint()
            flat.merge(b)
            buck.merge(b)
            mor.merge(b)
        want = _py_lww_evolved(batches)

        def rows(table):
            if not table.exists():
                return []
            df = table.read()
            cols = df.columns
            return sorted(
                (
                    r["id"],
                    r["val"],
                    r["note"] if "note" in cols else None,
                    r["__ts_ms"],
                )
                for r in df.collect()
            )

        assert rows(flat) == want
        assert rows(buck) == want
        assert rows(mor) == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


_KEYSET = st.lists(
    st.integers(min_value=0, max_value=7),  # 6,7 never occur: absent keys
    min_size=1,
    max_size=4,
    unique=True,
)


@given(_BATCHES, _KEYSET)
@settings(max_examples=4, deadline=None)
def test_lookup_equals_filtered_read(spark, batches, keys):
    """Point reads are an ACCESS PATH, not a semantic: lookup(keys)
    must equal read().filter(key in keys) on every backend — including
    bucket-pruned lookups against a table whose last rows were deleted
    (the empty-but-exists state)."""
    work = tempfile.mkdtemp(prefix="backend_lookup_props_")
    try:
        flat = MergeTable(spark, f"{work}/flat", ["id"])
        buck = MergeTable(spark, f"{work}/buck", ["id"], bucket_by=4)
        mor = MergeTableMOR(spark, f"{work}/mor", ["id"])
        for batch in batches:
            b = _spark_batch(spark, batch).localCheckpoint()
            flat.merge(b)
            buck.merge(b)
            mor.merge(b)
        want = [t for t in _py_lww(batches) if t[0] in set(keys)]
        kdf = spark.createDataFrame([(k,) for k in keys], "id long")
        for table in (flat, buck, mor):
            if not table.exists():
                assert want == []
                continue
            got = sorted(
                (r["id"], r["val"], r["__ts_ms"])
                for r in table.lookup(kdf).collect()
            )
            assert got == want, type(table).__name__
    finally:
        shutil.rmtree(work, ignore_errors=True)


@given(
    _BATCHES,
    st.integers(min_value=0, max_value=2),       # rebucket after batch i
    st.sampled_from([None, 2, 8]),               # target layout
)
@settings(max_examples=4, deadline=None)
def test_rebucket_midstream_preserves_state(spark, batches, cut, new_n):
    """Layout evolution is content-invariant: rebucketing (or
    flattening) between any two merges must leave the final state
    equal to the never-rebucketed model."""
    work = tempfile.mkdtemp(prefix="backend_rebucket_props_")
    try:
        t = MergeTable(spark, f"{work}/t", ["id"], bucket_by=4)
        for i, batch in enumerate(batches):
            t.merge(_spark_batch(spark, batch).localCheckpoint())
            if i == cut and t.exists():
                t.rebucket(new_n)
        assert _state(t) == _py_lww(batches)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@given(_BATCHES, st.integers(min_value=0, max_value=2))
@settings(max_examples=4, deadline=None)
def test_mor_compact_midstream_invariant(spark, batches, cut):
    """compact() folds deltas into a new base — at ANY point in the
    ingest sequence it must not change the resolved state, and later
    merges must keep agreeing with the model."""
    work = tempfile.mkdtemp(prefix="backend_compact_props_")
    try:
        mor = MergeTableMOR(spark, f"{work}/mor", ["id"])
        for i, batch in enumerate(batches):
            mor.merge(_spark_batch(spark, batch).localCheckpoint())
            if i == cut and mor.exists():
                mor.compact()
        assert _state(mor) == _py_lww(batches)
    finally:
        shutil.rmtree(work, ignore_errors=True)
