"""Model-based property test for the CDC ENGINE path: random Debezium
envelope batches through CdcEngine.process_batch must leave the table
(and the quarantine) exactly where a sequential python model of the
documented semantics puts them — raw-stage LWW per message key,
null-key payload grouping, quarantine of NULL-key survivors, keyed
MERGE with op-code dispatch, and add-column schema evolution with the
COW retention rule (a winning upsert whose schema LACKS a column keeps
the stored value).

The storage-backend properties (test_backend_equivalence_props) pin
the merge algebra; this pins the GLUE above it — envelope parse, key
inference from the message key schema, LWW grouping, quarantine
routing, evolution — which is the reference's actual program
(/root/reference/incremental_kafka_s3_cdc.py:321-388)."""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_spark.cdc.pipeline import CdcEngine, LakeConfig

_EVENT = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=4)),  # key
    st.sampled_from(["a", "b", "dd", ""]),                        # value
    st.integers(min_value=0, max_value=9),                        # ts
    st.sampled_from(["c", "u", "d"]),                             # op
)
_BATCHES = st.lists(
    st.tuples(
        st.lists(_EVENT, min_size=1, max_size=5),
        st.booleans(),  # batch carries the evolved `note` column
    ),
    min_size=1,
    max_size=3,
)


def _normalize(batches):
    """Make each batch model-friendly WITHOUT changing what is being
    tested: timestamps become unique per batch (ts*100 + position —
    LWW ties without an __offset tiebreaker are legitimately
    unordered, so the property avoids them), and a keyed event is
    moved to the end (the engine reads the key schema from the TAIL
    message; order is otherwise irrelevant once timestamps are
    unique). Batches with no keyed event at all are dropped (they
    would legitimately route to the keyless-append path — a different
    contract)."""
    out = []
    for events, has_note in batches:
        events = [
            (k, v, ts * 100 + i, op)
            for i, (k, v, ts, op) in enumerate(events)
        ]
        keyed = [e for e in events if e[0] is not None]
        if not keyed:
            continue
        rest = [e for e in events if e is not keyed[-1]]
        out.append((rest + [keyed[-1]], has_note))
    return out


def _schema_json(has_note: bool) -> str:
    fields = [
        {"field": "id", "type": "int64", "optional": False},
        {"field": "val", "type": "string", "optional": True},
    ]
    if has_note:
        fields.append({"field": "note", "type": "string", "optional": True})
    return json.dumps({"type": "struct", "fields": fields})


def _envelope_df(spark, events, has_note):
    schema = _schema_json(has_note)
    rows = []
    for k, v, ts, op in events:
        payload = {"id": k, "val": v}
        if has_note:
            payload["note"] = f"n{v}"
        rows.append(
            (
                json.dumps({"id": k}),
                json.dumps({"schema": json.loads(schema), "payload": payload}),
                "source_glaucus1.oms1.t1",
                "t1",
                op,
                ts,
                "oms1",
            )
        )
    return spark.createDataFrame(
        rows,
        "key string, value string, __topic string, __table string, "
        "__op string, __ts_ms long, __db string",
    )


def _model(batches):
    """Sequential semantics: per batch, LWW by key (unique ts so max-ts
    wins); the null-key group's survivor is quarantined (one row per
    batch that has any); winners apply c/u as upsert, d as delete;
    `note` follows the COW retention rule."""
    state: dict[int, tuple[str, object, int]] = {}
    n_quarantined = 0
    for events, has_note in batches:
        winners: dict[object, tuple[int, str, str]] = {}
        for k, v, ts, op in events:
            cur = winners.get(k)
            if cur is None or ts > cur[0]:
                winners[k] = (ts, v, op)
        if None in winners:
            n_quarantined += 1
            del winners[None]
        for k, (ts, v, op) in winners.items():
            if op == "d":
                state.pop(k, None)
            elif has_note:
                state[k] = (v, f"n{v}", ts)
            else:
                prior = state.get(k)
                state[k] = (v, prior[1] if prior else None, ts)
    want = sorted((k, v, n, ts) for k, (v, n, ts) in state.items())
    return want, n_quarantined


@given(_BATCHES)
@settings(max_examples=6, deadline=None)
def test_engine_matches_model(spark, batches):
    batches = _normalize(batches)
    if not batches:
        return
    root = tempfile.mkdtemp(prefix="cdc_engine_props_")
    try:
        engine = CdcEngine(spark, LakeConfig(root=root))
        for events, has_note in batches:
            engine.process_batch(_envelope_df(spark, events, has_note))
        want, want_q = _model(batches)

        table = engine.tables.get("t1")
        if table is None or not table.exists():
            got = []
        else:
            df = table.read()
            cols = df.columns
            got = sorted(
                (
                    r["id"],
                    r["val"],
                    r["note"] if "note" in cols else None,
                    r["__ts_ms"],
                )
                for r in df.collect()
            )
        assert got == want, (batches, got, want)

        qdir = os.path.join(root, "_quarantine", "t1")
        if os.path.isdir(qdir) and glob.glob(f"{qdir}/*.parquet"):
            got_q = spark.read.parquet(qdir).count()
        else:
            got_q = 0
        assert got_q == want_q, (batches, got_q, want_q)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _keyless_envelope_df(spark, events, has_note):
    """Same envelopes but with NULL message keys throughout — the
    engine must route to the keyless-append path (reference :275-276
    INSERT fallback)."""
    schema = _schema_json(has_note)
    rows = []
    for k, v, ts, op in events:
        payload = {"id": k, "val": v}
        if has_note:
            payload["note"] = f"n{v}"
        rows.append(
            (
                None,
                json.dumps({"schema": json.loads(schema), "payload": payload}),
                "source_glaucus1.oms1.t2",
                "t2",
                op,
                ts,
                "oms1",
            )
        )
    return spark.createDataFrame(
        rows,
        "key string, value string, __topic string, __table string, "
        "__op string, __ts_ms long, __db string",
    )


@given(_BATCHES)
@settings(max_examples=4, deadline=None)
def test_keyless_append_matches_model(spark, batches):
    """No key schema → append-only: every non-delete row accumulates
    (no LWW, no dedup, no quarantine), deletes are dropped."""
    batches = [
        ([(k if k is not None else 9, v, ts * 100 + i, op)
          for i, (k, v, ts, op) in enumerate(events)], has_note)
        for events, has_note in batches
    ]
    root = tempfile.mkdtemp(prefix="cdc_keyless_props_")
    try:
        engine = CdcEngine(spark, LakeConfig(root=root))
        for events, has_note in batches:
            engine.process_batch(
                _keyless_envelope_df(spark, events, has_note)
            )
        want = sorted(
            (k, v, ts)
            for events, _ in batches
            for (k, v, ts, op) in events
            if op != "d"
        )
        table = engine.tables.get("t2")
        if table is None or not table.exists():
            got = []
        else:
            got = sorted(
                (r["id"], r["val"], r["__ts_ms"])
                for r in table.read().collect()
            )
        assert got == want, (batches, got, want)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(_BATCHES, st.integers(min_value=2, max_value=3))
@settings(max_examples=3, deadline=None)
def test_multi_table_routing_matches_model(spark, batches, par):
    """Two tables interleaved in every batch, processed through the
    thread-pooled per-table dispatch (table_parallelism > 1): each
    table's final state must equal the single-table model applied to
    ITS slice — no cross-table bleed through the shared cached raw
    frame or the threaded routing."""
    batches = _normalize(batches)
    if not batches:
        return
    root = tempfile.mkdtemp(prefix="cdc_multi_props_")
    try:
        engine = CdcEngine(
            spark, LakeConfig(root=root, table_parallelism=par)
        )
        for events, has_note in batches:
            a = _envelope_df(spark, events, has_note)
            # table B sees the same events shifted by one ts unit so
            # the two slices are distinct but correlated
            b_events = [
                (k, v, ts + 1, op) for (k, v, ts, op) in events
            ]
            b = _envelope_df(spark, b_events, has_note).withColumn(
                "__table", F.lit("t9")
            ).withColumn(
                "__topic", F.lit("source_glaucus1.oms1.t9")
            )
            engine.process_batch(a.unionByName(b))
        for name, shift in (("t1", 0), ("t9", 1)):
            shifted = [
                (
                    [(k, v, ts + shift, op) for (k, v, ts, op) in ev],
                    hn,
                )
                for ev, hn in batches
            ]
            want, _ = _model(shifted)
            table = engine.tables.get(name)
            if table is None or not table.exists():
                got = []
            else:
                df = table.read()
                cols = df.columns
                got = sorted(
                    (
                        r["id"],
                        r["val"],
                        r["note"] if "note" in cols else None,
                        r["__ts_ms"],
                    )
                    for r in df.collect()
                )
            assert got == want, (name, batches, got, want)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    st.lists(_EVENT, min_size=1, max_size=4),
    st.lists(
        st.sampled_from(
            [
                "not json at all",
                '{"schema": null, "payload": "string-not-object"}',
                '{"schema": {}, "payload": {"val": "x"}}',  # no id field
                '{"payload": {"id": null, "val": "y"}}',    # explicit null id
            ]
        ),
        min_size=1,
        max_size=3,
    ),
)
@settings(max_examples=4, deadline=None)
def test_malformed_payloads_quarantined_not_merged(spark, events, bads):
    """Envelopes whose payload parses to NULL key columns — broken
    JSON, non-object payloads, missing or null id — are quarantined,
    never merged, and never poison the valid rows sharing the batch.
    Malformed rows carry message keys DISJOINT from the valid ones so
    the raw-stage LWW cannot make a malformed event shadow a valid
    event's key (that shadowing edge is a separate, order-dependent
    contract)."""
    events = [
        (k if k is not None else 3, v, ts * 100 + i, op)
        for i, (k, v, ts, op) in enumerate(events)
    ]
    root = tempfile.mkdtemp(prefix="cdc_malformed_props_")
    try:
        engine = CdcEngine(spark, LakeConfig(root=root))
        good = _envelope_df(spark, events, False)
        bad_rows = [
            (json.dumps({"id": 100 + j}), b, "source_glaucus1.oms1.t1",
             "t1", "u", 1_000_000 + j, "oms1")
            for j, b in enumerate(bads)
        ]
        bad = spark.createDataFrame(
            bad_rows,
            "key string, value string, __topic string, __table string, "
            "__op string, __ts_ms long, __db string",
        )
        engine.process_batch(good.unionByName(bad))

        want, _ = _model([(events, False)])
        table = engine.tables.get("t1")
        if table is None or not table.exists():
            got = []
        else:
            got = sorted(
                (r["id"], r["val"], None, r["__ts_ms"])
                for r in table.read().collect()
            )
        assert got == want, (events, bads, got, want)

        qdir = os.path.join(root, "_quarantine", "t1")
        got_q = (
            spark.read.parquet(qdir).count()
            if os.path.isdir(qdir) and glob.glob(f"{qdir}/*.parquet")
            else 0
        )
        # each malformed row has a distinct message key -> all survive
        # the raw LWW and all land in quarantine
        assert got_q == len(bads), (bads, got_q)
    finally:
        shutil.rmtree(root, ignore_errors=True)
