"""Unigram-LM tokenizer tests (operators/unigram.py).

Covers: hand-checked Viterbi segmentation including the
(score, length) tie-break, all three [UNK] routes, EM trainer
invariants (likelihood never decreases, expected counts match an
exhaustive-enumeration recount, determinism), the JVM DP fold == the
sequential python Viterbi on random models, per-doc stats arithmetic
(exact integer score sums, empty-doc retention), and the fold staying
JVM-only.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.operators.unigram import (
    UG_UNK,
    _lattice_estep,
    unigram_doc_stats,
    unigram_em_loop,
    unigram_encode_words,
    unigram_viterbi_py,
)

NANO = 1_000_000_000


def test_viterbi_hand_checked(spark):
    # scores chosen so "abc" has two candidate splits:
    #   [ab, c] = -10 + -30 = -40  (best)
    #   [a, bc] = -20 + -25 = -45
    #   [a, b, c] = -20 + -15 + -30 = -65
    scores = [
        ("a", -20), ("b", -15), ("c", -30), ("ab", -10), ("bc", -25),
    ]
    df = spark.createDataFrame(
        [("abc",), ("b",), ("zq",), ("x" * 33,), ("é",)], ["word"]
    )
    got = {
        r["word"]: (r["ug_tokens"], r["is_unk"], r["ug_score"])
        for r in unigram_encode_words(df, scores).collect()
    }
    assert got["abc"] == (["ab", "c"], False, -40)
    assert got["b"] == (["b"], False, -15)
    # char outside the inventory -> unreachable -> UNK, NULL score
    assert got["zq"] == ([UG_UNK], True, None)
    # over max_word_len -> UNK without running the fold
    assert got["x" * 33] == ([UG_UNK], True, None)
    # non-printable-ASCII -> UNK
    assert got["é"] == ([UG_UNK], True, None)


def test_viterbi_tie_breaks_to_longer_piece(spark):
    # genuine DP-cell tie at position 3: best[2] = -14 (path [a, b]),
    # so [a, b, c] = -20 via l=1 and [a, bc] = -10 + -10 = -20 via
    # l=2; the cell compares (score, piece_len) structs -> the
    # length-2 piece "bc" wins, path [a, bc]
    scores = [
        ("a", -10), ("b", -4), ("c", -6), ("ab", -15), ("bc", -10),
    ]
    df = spark.createDataFrame([("abc",)], ["word"])
    row = unigram_encode_words(df, scores).collect()[0]
    assert row["ug_tokens"] == ["a", "bc"] and row["ug_score"] == -20
    # the python reference implements the identical tie-break
    assert unigram_viterbi_py("abc", dict(scores), 2) == (
        ["a", "bc"],
        -20,
    )


def test_encode_rejects_bad_inventories(spark):
    df = spark.createDataFrame([("a",)], ["word"])
    with pytest.raises(ValueError, match="empty piece inventory"):
        unigram_encode_words(df, [])
    with pytest.raises(ValueError, match="empty-string piece"):
        unigram_encode_words(df, [("", -1), ("a", -2)])


def test_fold_matches_python_viterbi_random(spark):
    """The JVM DP fold and the sequential python Viterbi agree on
    tokens, UNK flags, and exact integer scores over random models."""
    import random

    rng = random.Random(11)
    alphabet = "abcd"
    pieces = {c: -rng.randint(10, 40) * NANO for c in alphabet[:3]}
    # 'd' deliberately absent -> words containing d go UNK
    for _ in range(25):
        ln = rng.randint(2, 4)
        p = "".join(rng.choice(alphabet[:3]) for _ in range(ln))
        pieces.setdefault(p, -rng.randint(5, 60) * NANO)
    scores = sorted(pieces.items())
    words = [
        "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 12))
        )
        for _ in range(120)
    ]
    df = spark.createDataFrame([(w,) for w in set(words)], ["word"])
    got = {
        r["word"]: (r["ug_tokens"], r["is_unk"], r["ug_score"])
        for r in unigram_encode_words(df, scores).collect()
    }
    maxp = max(len(p) for p, _ in scores)
    for w in set(words):
        ref = unigram_viterbi_py(w, dict(scores), maxp)
        if ref is None:
            assert got[w] == ([UG_UNK], True, None), w
        else:
            toks, s = ref
            assert got[w] == (toks, False, s), w


def _tiny_corpus():
    return [("ababab", 4), ("abc", 3), ("cab", 2), ("b", 1)]


def test_estep_matches_exhaustive_enumeration():
    """Expected counts from the forward-backward lattice equal the
    brute-force sum over ALL segmentations (posterior-weighted), the
    from-scratch recount model."""
    wf = sorted(_tiny_corpus())
    logp = {
        "a": math.log(0.3), "b": math.log(0.25), "c": math.log(0.15),
        "ab": math.log(0.2), "ca": math.log(0.1),
    }
    maxp = 2
    exp, ll = _lattice_estep(wf, logp, maxp)

    def segmentations(w):
        if not w:
            return [[]]
        out = []
        for piece_len in range(1, min(maxp, len(w)) + 1):
            p = w[:piece_len]
            if p in logp:
                out += [[p] + rest for rest in segmentations(w[piece_len:])]
        return out

    brute = {p: 0.0 for p in logp}
    brute_ll = 0.0
    for w, f in wf:
        segs = segmentations(w)
        probs = [math.exp(sum(logp[p] for p in s)) for s in segs]
        z = sum(probs)
        brute_ll += f * math.log(z)
        for s, pr in zip(segs, probs):
            for p in s:
                brute[p] += f * pr / z
    assert ll == pytest.approx(brute_ll, rel=1e-9)
    for p in logp:
        assert exp[p] == pytest.approx(brute[p], rel=1e-9, abs=1e-12)


def test_em_likelihood_never_decreases():
    from data_engineering_spark.operators.unigram import _mstep

    wf = sorted(_tiny_corpus())
    counts = {}
    for w, f in wf:
        for i in range(len(w)):
            for piece_len in range(1, min(3, len(w) - i) + 1):
                p = w[i : i + piece_len]
                counts[p] = counts.get(p, 0) + f
    logp = _mstep({p: float(c) for p, c in counts.items()})
    lls = []
    for _ in range(6):
        exp, ll = _lattice_estep(wf, logp, 3)
        lls.append(ll)
        logp = _mstep(exp)
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:])), lls


def test_trainer_deterministic_and_input_order_free():
    wf = _tiny_corpus()
    a = unigram_em_loop(wf, vocab_size=8, max_piece_len=3)
    b = unigram_em_loop(list(reversed(wf)), vocab_size=8, max_piece_len=3)
    assert a == b
    # singles always survive pruning; every word stays segmentable
    kept = {p for p, _ in a}
    assert {"a", "b", "c"} <= kept
    for w, _ in wf:
        assert unigram_viterbi_py(w, dict(a), 3) is not None


def test_doc_stats_arithmetic_and_empty_docs(spark):
    scores = [("a", -2 * NANO), ("b", -3 * NANO), ("ab", -4 * NANO)]
    df = spark.createDataFrame(
        [(1, "ab ab zz"), (2, ""), (3, "b")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_ug_tokens"], r["n_unk_words"],
            r["ug_score_sum"],
        )
        for r in unigram_doc_stats(df, scores).collect()
    }
    # doc 1: "ab" x2 (1 token, -4n each) + "zz" (UNK, no score)
    assert got[1] == (3, 3, 1, -8 * NANO)
    assert got[2] == (0, 0, 0, 0)
    assert got[3] == (1, 1, 0, -3 * NANO)


def test_encode_ids_stream(spark):
    """Token-id stream: ids are sorted-piece order (UNK=0), the
    stream covers every (word, token) occurrence with 0-based
    positions, and UNK words emit exactly one id-0 token."""
    from data_engineering_spark.operators.unigram import (
        unigram_encode_ids,
        unigram_vocab_ids,
    )

    scores = [("a", -2 * NANO), ("b", -3 * NANO), ("ab", -4 * NANO)]
    assert unigram_vocab_ids(scores) == [
        ("[UNK]", 0), ("a", 1), ("ab", 2), ("b", 3),
    ]
    df = spark.createDataFrame(
        [(1, "ab ba zz"), (2, "b")], ["doc_id", "text"]
    )
    rows = {
        (r["doc_id"], r["wpos"], r["tpos"]): r["token_id"]
        for r in unigram_encode_ids(df, scores).collect()
    }
    assert rows == {
        (1, 0, 0): 2,            # "ab" -> [ab]
        (1, 1, 0): 3, (1, 1, 1): 1,  # "ba" -> [b, a]
        (1, 2, 0): 0,            # "zz" -> [UNK]
        (2, 0, 0): 3,            # "b"
    }


def test_encode_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("ab",)], ["word"])
    plan = (
        unigram_encode_words(df, [("a", -1), ("b", -2)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
