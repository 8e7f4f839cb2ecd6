"""Adversarial equality test for the PPJoin rewrite (round 5): the
prefix-filter + positional-filter candidate generation must produce
EXACTLY the brute-force pair set on corpora engineered to stress the
filter math — equal set sizes (orientation ties), duplicate documents
(jaccard 1.0), boundary-similarity pairs, hot boilerplate shingles,
and docs at/below the shingle minimum."""

from __future__ import annotations

import itertools
import random

import pytest

from data_engineering_spark.operators.text import ngram_jaccard_pairs


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def _brute_force(docs, threshold: float, n: int = 3):
    sets = {i: _shingles(t, n) for i, t in docs if _shingles(t, n)}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= threshold:
            out[(a, b)] = (inter, inter / union)
    return out


def _corpora():
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab => hot shingles
    cs = []
    # random small-vocab corpora (high collision rate)
    for seed in range(4):
        r = random.Random(seed)
        cs.append([
            (i, " ".join(r.choice(vocab) for _ in range(r.randint(1, 18))))
            for i in range(30)
        ])
    # duplicates + near-duplicates + equal-size ties
    base = " ".join(rng.choice(vocab) for _ in range(12))
    cs.append([
        (0, base),
        (1, base),                         # exact duplicate
        (2, base + " w0"),                 # superset
        (3, "w1 " + base),                 # same size as 2 (tie)
        (4, " ".join(reversed(base.split()))),
        (5, "w0 w1"),                      # below shingle minimum
        (6, "w0 w1 w2"),                   # exactly one shingle
        (7, "w0 w1 w2"),                   # its duplicate
    ])
    return cs


@pytest.mark.parametrize("threshold", [0.3, 0.6, 0.8])
def test_ppjoin_equals_brute_force(spark, threshold):
    for docs in _corpora():
        want = _brute_force(docs, threshold)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard_r"])
            for r in ngram_jaccard_pairs(
                df, threshold=threshold
            ).collect()
        }
        assert set(got) == set(want), (
            f"t={threshold}: missing={set(want) - set(got)} "
            f"extra={set(got) - set(want)}"
        )
        for pair, (common, jac) in want.items():
            assert got[pair][0] == common
            assert got[pair][1] == pytest.approx(jac, abs=1e-12)


@pytest.mark.parametrize("threshold", [0.3, 0.6])
def test_join_verify_equals_brute_force(spark, threshold):
    """verify='join' (row-bounded pair×shingle counting, the
    long-document escape hatch) must be bit-identical to the default
    array verify on the same adversarial corpora."""
    for docs in _corpora():
        want = _brute_force(docs, threshold)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard_r"])
            for r in ngram_jaccard_pairs(
                df, threshold=threshold, verify="join"
            ).collect()
        }
        assert set(got) == set(want)
        for pair, (common, jac) in want.items():
            assert got[pair][0] == common
            assert got[pair][1] == pytest.approx(jac, abs=1e-12)


def test_verify_mode_validation(spark):
    df = spark.createDataFrame([(0, "a b c d")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="verify"):
        ngram_jaccard_pairs(df, verify="bogus")
