"""Eval-set decontamination (operators/decontaminate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.operators.decontaminate import (
    contamination_stats,
    decontaminate,
    eval_gram_set,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_hand_checked(spark):
    """n=3: doc 1 shares the gram 'b c d' with the eval doc; doc 2
    shares none; doc 3 is too short to carry any 3-gram."""
    corpus = _docs(
        spark,
        [
            (1, "a b c d e"),     # grams: abc bcd cde → bcd matches
            (2, "x y z w"),       # grams: xyz yzw → no match
            (3, "p q"),           # no 3-grams
        ],
    )
    eval_docs = _docs(spark, [(100, "q b c d p")])  # grams incl. bcd
    got = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"], r["contaminated"])
        for r in contamination_stats(
            corpus, eval_docs, n=3
        ).collect()
    }
    assert got == {
        1: (3, 1, True),
        2: (2, 0, False),
        3: (0, 0, False),
    }
    clean = {r["doc_id"] for r in decontaminate(corpus, eval_docs, n=3).collect()}
    assert clean == {2, 3}


def test_duplicate_grams_count_once_per_doc(spark):
    """Distinct-gram semantics: a gram repeated inside one doc is one
    unit of contamination, not many (shingles are per-doc distinct)."""
    corpus = _docs(spark, [(1, "a b a b a b")])  # 'a b a' and 'b a b' repeat
    eval_docs = _docs(spark, [(9, "a b a")])
    got = contamination_stats(corpus, eval_docs, n=3).collect()[0]
    assert got["n_grams"] == 2  # {'a b a', 'b a b'}
    assert got["n_contaminated"] == 1


def test_empty_and_whitespace_docs_survive(spark):
    corpus = _docs(spark, [(1, ""), (2, "   "), (3, "a b c")])
    eval_docs = _docs(spark, [(9, "nothing shared here at all")])
    got = {r["doc_id"]: r["contaminated"] for r in
           contamination_stats(corpus, eval_docs, n=3).collect()}
    assert got == {1: False, 2: False, 3: False}
    assert decontaminate(corpus, eval_docs, n=3).count() == 3


def test_eval_gram_bound_enforced(spark):
    eval_docs = _docs(spark, [(9, "a b c d e f g h")])
    with pytest.raises(ValueError, match="max_eval_grams"):
        eval_gram_set(eval_docs, n=3, max_eval_grams=2)


def test_eval_side_broadcasts_and_corpus_never_shuffles_text(spark):
    """Scale posture: the gram join must be a broadcast (the eval set
    is the bounded side); the only corpus shuffle is the per-doc
    fixed-width aggregate."""
    from data_engineering_spark.plans.explain import plan_string

    from data_engineering_spark.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    stats = contamination_stats(
        d, d.filter(F.pmod("doc_id", F.lit(97)) == 0), n=6
    )
    plan = plan_string(stats)
    assert "BroadcastHashJoin" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
