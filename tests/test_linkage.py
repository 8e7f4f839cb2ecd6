"""Edit-distance self-join semantics (operators/linkage.py): the
FastSS k=1 blocking must find EVERY pair at distance <= 1 — verified
against a brute-force levenshtein over all pairs."""

from __future__ import annotations

import itertools

from data_engineering_spark.operators.linkage import (
    edit_distance_self_join,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


NAMES = [
    "martha",   # 0: base
    "marta",    # 1: deletion
    "marthas",  # 2: insertion
    "marsha",   # 3: substitution
    "mabel",    # 4: far away
    "aapple",   # 5: doubled letter
    "apple",    # 6: deletion of either 'a' -> same variant
    "martha",   # 7: exact duplicate of 0
    "xartha",   # 8: substitution at position 1 (prefix differs)
    "marthx",   # 9: substitution at last position
]


def test_matches_brute_force(spark):
    df = spark.createDataFrame(
        list(enumerate(NAMES)), "id long, s string"
    )
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_self_join(df, "id", "s").collect()
    )
    want = sorted(
        (i, j, _lev(NAMES[i], NAMES[j]))
        for i, j in itertools.combinations(range(len(NAMES)), 2)
        if _lev(NAMES[i], NAMES[j]) <= 1
    )
    assert got == want
    # sanity on the fixture itself: every edit kind is represented
    assert (0, 1, 1) in want and (0, 2, 1) in want and (0, 3, 1) in want
    assert (5, 6, 1) in want and (0, 7, 0) in want
    assert (0, 8, 1) in want and (0, 9, 1) in want


def test_k2_rejected(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    try:
        edit_distance_self_join(df, "id", "s", max_dist=2)
    except ValueError:
        return
    raise AssertionError("max_dist=2 must raise")
