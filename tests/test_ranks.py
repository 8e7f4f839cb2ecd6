"""Distributed exact total-order ranks (operators/ranks.py) — the
machinery behind q_events_equidepth_histogram, property-tested against
DuckDB's own row_number/ntile on adversarial distributions (heavy
ties, constants, skew, negatives, tiny N, N < n_buckets)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_spark.operators.ranks import (
    exact_global_rank,
    exact_ntile,
)

_VALS = st.lists(
    st.sampled_from(
        [0.0, 1.0, 1.0, 1.0, -3.5, 2.25, 2.25, 100.0, -100.0, 7.125]
    ),
    min_size=0,
    max_size=40,
)


def _duck(rows, n_buckets):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE, i BIGINT)")
    if not rows:
        return {}
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            "SELECT v, i, ROW_NUMBER() OVER (ORDER BY v, i), "
            f"ntile({n_buckets}) OVER (ORDER BY v, i) FROM t"
        ).fetchall()
    }


@given(vals=_VALS, n_buckets=st.sampled_from([1, 3, 10]))
@settings(max_examples=15, deadline=None)
def test_rank_and_ntile_match_duckdb(spark, vals, n_buckets):
    rows = [(v, i) for i, v in enumerate(vals)]  # unique ids
    df = spark.createDataFrame(
        rows, "value double, event_id long"
    ) if rows else spark.createDataFrame([], "value double, event_id long")
    ranked, total = exact_global_rank(
        df, "value", "event_id", n_parts=5
    )
    assert total == len(rows)
    got_rank = {
        (r["value"], r["event_id"]): r["__rank"]
        for r in ranked.collect()
    }
    nt = exact_ntile(df, n_buckets, "value", "event_id", n_parts=5)
    got_bucket = {
        (r["value"], r["event_id"]): r["bucket"] for r in nt.collect()
    }
    want = _duck(rows, n_buckets)
    assert set(got_rank) == set(want)
    for k, (wr, wb) in want.items():
        assert got_rank[k] == wr, (k, got_rank[k], wr)
        assert got_bucket[k] == wb, (k, got_bucket[k], wb)


def test_empty_frame(spark):
    df = spark.createDataFrame([], "value double, event_id long")
    ranked, total = exact_global_rank(df, "value", "event_id")
    assert total == 0 and ranked.count() == 0
    assert exact_ntile(df, 10, "value", "event_id").count() == 0


def test_null_value_key_raises(spark):
    """ADVICE r7: null keys would silently land in range 0 and sort
    NULLS FIRST (Spark) vs NULLS LAST (DuckDB) — the contract is
    enforced, not assumed."""
    import pytest

    df = spark.createDataFrame(
        [(1.0, 1), (None, 2), (3.0, 3)], "value double, event_id long"
    )
    with pytest.raises(ValueError, match="null/NaN"):
        exact_global_rank(df, "value", "event_id")
    with pytest.raises(ValueError, match="null/NaN"):
        exact_ntile(df, 4, "value", "event_id")


def test_nan_value_key_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [(1.0, 1), (float("nan"), 2)], "value double, event_id long"
    )
    with pytest.raises(ValueError, match="null/NaN"):
        exact_global_rank(df, "value", "event_id")


def test_non_float_value_col_accepted(spark):
    """isnan() only types on float/double — an integer key column must
    still work (null check only)."""
    df = spark.createDataFrame(
        [(10, 1), (20, 2), (10, 3)], "value long, event_id long"
    )
    ranked, total = exact_global_rank(df, "value", "event_id")
    got = {r["event_id"]: r["__rank"] for r in ranked.collect()}
    assert total == 3 and got == {1: 1, 3: 2, 2: 3}
