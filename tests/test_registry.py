"""Registry contract invariants (data_engineering_spark/registry.py).

The oracle matrix is only as strong as the registration rules: every
rows-only twin must declare which columns it reproduces exactly
(rows_key_cols, VERDICT r9 #4), the two oracle kinds are exclusive,
and the registered surface stays internally consistent.
"""

from __future__ import annotations

import pytest

from data_engineering_spark.registry import (
    ORACLES,
    QUERIES,
    ROWS_KEY_COLS,
    ROWS_ORACLES,
    query,
)


def test_rows_oracle_requires_key_cols():
    with pytest.raises(ValueError, match="rows_key_cols"):
        query("x_bad_rows_only", rows_oracle="SELECT 1")


def test_key_cols_require_rows_oracle():
    with pytest.raises(ValueError, match="rows_oracle"):
        query("x_bad_keys_only", rows_key_cols=["a"])


def test_oracle_kinds_exclusive():
    with pytest.raises(ValueError, match="exclusive"):
        query(
            "x_bad_both",
            oracle="SELECT 1",
            rows_oracle="SELECT 1",
            rows_key_cols=[],
        )


def test_every_rows_only_query_declares_key_cols():
    # ROWS_KEY_COLS mirrors ROWS_ORACLES exactly (an empty list is an
    # explicit "only the count is exact" declaration, never an omission)
    assert set(ROWS_ORACLES) == set(ROWS_KEY_COLS)


def test_oracle_sets_are_disjoint_and_registered():
    assert not set(ORACLES) & set(ROWS_ORACLES)
    assert set(ORACLES) <= set(QUERIES)
    assert set(ROWS_ORACLES) <= set(QUERIES)


def test_no_deferred_oracle_survives_import():
    """q_conv_context_windows registers with oracle="__deferred__" and
    the real SQL is patched in at queries/sft.py module bottom; a
    refactor that drops that assignment would ship the literal
    "__deferred__" string to DuckDB (VERDICT r10 missing #3). Pin it:
    after importing the full query surface, no registered oracle (of
    either kind) may still be the deferred sentinel."""
    import data_engineering_spark.queries  # noqa: F401

    deferred = [
        name
        for reg in (ORACLES, ROWS_ORACLES)
        for name, sql in reg.items()
        if sql == "__deferred__"
    ]
    assert deferred == [], (
        f"deferred oracles never resolved: {deferred}"
    )
