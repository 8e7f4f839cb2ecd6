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
