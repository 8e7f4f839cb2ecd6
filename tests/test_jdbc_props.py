"""Model-based property tests for the JDBC snapshot engine
(snapshot/jdbc_snapshot.py) over live embedded Derby — the r6 verdict
item 5: the CDC-side hypothesis campaigns found 5 real bugs in rounds
5-6; this gives the snapshot path the same treatment.

Each example builds a RANDOM source table (PK kind: bigint / varchar /
composite / none / nullable-key-with-NULLs; row multiset with negative
ids, NULLs, quote-bearing strings, empty tables, all-NULL key columns)
and drives ``snapshot_table`` end to end, then compares the lake
parquet against a sequential python model of the documented semantics:

- complete, exactly-once content whatever the partitioning path taken
  (range-partitioned, string-key fallback, NULL-bounds fallback,
  single-partition);
- empty source → no append, no audit row;
- audit-log replay: a second run consults ``snapshotted_tables`` and
  skips exactly the loaded (db, table) pairs, schema-qualified.
"""

from __future__ import annotations

import itertools

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_spark.snapshot.jdbc_snapshot import (
    JdbcConfig,
    snapshot_table,
    snapshotted_tables,
)

URL = "jdbc:derby:memory:jdbcprops"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
_IDS = itertools.count()


@pytest.fixture(scope="module")
def derby_conn(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(f"{URL};create=true")
    yield conn
    conn.close()


@pytest.fixture(scope="module")
def cfg():
    return JdbcConfig(
        url=URL, user="", password="", driver=DRIVER, ident_quote=""
    )


def _sql_lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _mk_table(conn, name: str, pk_kind: str, rows):
    st_ = conn.createStatement()
    pk = {
        "bigint": "k BIGINT NOT NULL PRIMARY KEY",
        "varchar": "k VARCHAR(20) NOT NULL PRIMARY KEY",
        "composite": "k BIGINT NOT NULL",
        "none": "k BIGINT",  # nullable, not a key at all
    }[pk_kind]
    extra = (
        ", PRIMARY KEY (k, k2)" if pk_kind == "composite" else ""
    )
    st_.execute(
        f"CREATE TABLE {name} ({pk}, "
        + ("k2 INT NOT NULL, " if pk_kind == "composite" else "")
        + f"val DOUBLE, note VARCHAR(40){extra})"
    )
    for r in rows:
        cols = ["k"] + (["k2"] if pk_kind == "composite" else []) + [
            "val",
            "note",
        ]
        st_.execute(
            f"INSERT INTO {name} ({', '.join(cols)}) VALUES "
            f"({', '.join(_sql_lit(r[c]) for c in cols)})"
        )
    conn.commit()
    st_.close()


def _drop(conn, name: str) -> None:
    st_ = conn.createStatement()
    try:
        st_.execute(f"DROP TABLE {name}")
        conn.commit()
    except Exception:
        pass
    st_.close()


_NOTE = st.one_of(
    st.none(),
    st.sampled_from(["a", "it's", 'q"q', "x y", ""]),
)
_VAL = st.one_of(st.none(), st.sampled_from([0.0, -1.5, 2.25, 1e9]))


def _rows_strategy(pk_kind: str):
    if pk_kind == "bigint":
        ks = st.integers(min_value=-50, max_value=50)
    elif pk_kind == "varchar":
        ks = st.sampled_from(["a", "b'c", "Z9", "-", "longish-key"])
    elif pk_kind == "composite":
        ks = st.integers(min_value=-5, max_value=5)
    else:  # nullable non-key column, NULLs allowed
        ks = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
    row = st.fixed_dictionaries(
        {
            "k": ks,
            "k2": st.integers(min_value=0, max_value=3),
            "val": _VAL,
            "note": _NOTE,
        }
    )
    return st.lists(row, min_size=0, max_size=10)


def _dedupe_keys(pk_kind: str, rows):
    """Derby enforces the PK; the generator doesn't — keep the first
    row per key (any fixed rule works: the property compares against
    what was actually inserted)."""
    if pk_kind == "none":
        return rows
    seen, out = set(), []
    for r in rows:
        key = (r["k"], r["k2"]) if pk_kind == "composite" else r["k"]
        if key in seen:
            continue
        seen.add(key)
        out.append(r)
    return out


def _expected(pk_kind: str, rows):
    cols = ["k"] + (["k2"] if pk_kind == "composite" else []) + [
        "val",
        "note",
    ]
    return sorted(
        (tuple(r[c] for c in cols) for r in rows), key=repr
    )


def _snapshot_and_read(
    spark, cfg, table: str, key, lake: str, num_partitions=3
):
    n = snapshot_table(
        spark,
        cfg,
        "APP",
        table,
        lake,
        rds_id=1,
        tenant_id=9,
        num_partitions=num_partitions,
        key=key,
    )
    import os

    dest = os.path.join(lake, "APP", table)
    if not os.path.exists(dest):
        return n, None
    return n, spark.read.parquet(dest)


@given(
    pk_kind=st.sampled_from(["bigint", "varchar", "composite", "none"]),
    rows=st.data(),
)
@settings(max_examples=10, deadline=None)
def test_snapshot_content_matches_source(
    spark, derby_conn, cfg, tmp_path_factory, pk_kind, rows
):
    """Whatever partitioning path the engine takes (range-partitioned
    bigint PK, string-PK int() fallback, nullable key with NULL rows,
    no key), the lake parquet holds EXACTLY the source rows, stamped
    with the system columns."""
    data = _dedupe_keys(pk_kind, rows.draw(_rows_strategy(pk_kind)))
    name = f"pt{next(_IDS)}"
    lake = str(tmp_path_factory.mktemp("lake"))
    _mk_table(derby_conn, name, pk_kind, data)
    try:
        key = None if pk_kind in ("varchar", "none") else "k"
        if pk_kind == "varchar":
            key = "k"  # exercises the non-integral-bounds fallback
        if pk_kind == "none" and data and any(
            r["k"] is not None for r in data
        ):
            key = "k"  # nullable key WITH NULL rows: the hard case
        n, out = _snapshot_and_read(spark, cfg, name, key, lake)
        assert n == len(data)
        if not data:
            # empty source: no parquet dir, no audit row
            assert out is None
            assert snapshotted_tables(spark, lake, 1) == set()
            return
        cols = ["k"] + (
            ["k2"] if pk_kind == "composite" else []
        ) + ["val", "note"]
        got = sorted(
            (tuple(r[c] for c in cols) for r in out.select(*cols).collect()),
            key=repr,
        )
        assert got == _expected(pk_kind, data)
        # system stamps present on every row
        stamped = out.filter(
            (out["__op"] == "r")
            & (out["__tenant_id"] == 9)
            & (out["__rds_id"] == 1)
        )
        assert stamped.count() == len(data)
        # audit log records the schema-qualified table exactly once
        assert snapshotted_tables(spark, lake, 1) == {f"APP.{name}"}
    finally:
        _drop(derby_conn, name)


@given(
    first=st.lists(
        st.integers(min_value=0, max_value=30),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    second=st.lists(
        st.integers(min_value=0, max_value=30),
        min_size=1,
        max_size=6,
        unique=True,
    ),
)
@settings(max_examples=6, deadline=None)
def test_audit_replay_skips_loaded_tables(
    spark, derby_conn, cfg, tmp_path_factory, first, second
):
    """The discovery loop's skip logic as a model: after snapshotting
    table A, a replay that consults snapshotted_tables must skip A and
    load only the new table B — and A's lake content must not grow."""
    lake = str(tmp_path_factory.mktemp("lake"))
    a, b = f"pa{next(_IDS)}", f"pb{next(_IDS)}"
    rows_a = [
        {"k": i, "k2": 0, "val": float(i), "note": None} for i in first
    ]
    rows_b = [
        {"k": i, "k2": 0, "val": float(i), "note": "b"} for i in second
    ]
    _mk_table(derby_conn, a, "bigint", rows_a)
    try:
        n, _ = _snapshot_and_read(spark, cfg, a, "k", lake)
        assert n == len(rows_a)
        done = snapshotted_tables(spark, lake, 1)
        assert done == {f"APP.{a}"}

        _mk_table(derby_conn, b, "bigint", rows_b)
        try:
            # replay: the run_snapshot loop's body over {a, b}
            for t in (a, b):
                if f"APP.{t}" in done:
                    continue
                _snapshot_and_read(spark, cfg, t, "k", lake)
            import os

            assert (
                spark.read.parquet(os.path.join(lake, "APP", a)).count()
                == len(rows_a)
            ), "replay must not re-append the loaded table"
            assert (
                spark.read.parquet(os.path.join(lake, "APP", b)).count()
                == len(rows_b)
            )
            assert snapshotted_tables(spark, lake, 1) == {
                f"APP.{a}",
                f"APP.{b}",
            }
        finally:
            _drop(derby_conn, b)
    finally:
        _drop(derby_conn, a)


def test_all_null_key_bounds_fallback(spark, derby_conn, cfg, tmp_path):
    """A nullable key column that is ENTIRELY NULL: the bounds probe
    returns (NULL, NULL) and the engine must fall back to a
    single-partition scan that still captures every row."""
    name = f"pn{next(_IDS)}"
    data = [
        {"k": None, "k2": 0, "val": 1.0, "note": "x"},
        {"k": None, "k2": 0, "val": None, "note": None},
    ]
    _mk_table(derby_conn, name, "none", data)
    try:
        lake = str(tmp_path / "lake")
        n, out = _snapshot_and_read(spark, cfg, name, "k", lake)
        assert n == 2
        assert out.count() == 2
        assert out.filter(out["k"].isNull()).count() == 2
    finally:
        _drop(derby_conn, name)
