"""WordPiece tokenizer tests (operators/wordpiece.py).

Covers: hand-checked greedy longest-match segmentation, all three
[UNK] routes, the likelihood-vs-frequency training distinction from
BPE, trainer == naive recount reference, the JVM fold == a sequential
python encoder on random vocab/piece sets, and per-doc stats
arithmetic including empty-doc retention.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.operators.wordpiece import (
    WP_UNK,
    _candidate_arrays,
    wordpiece_doc_stats,
    wordpiece_encode_words,
    wordpiece_merge_loop,
    wordpiece_train,
)


def py_greedy_encode(
    word: str, pieces: list[str], max_word_len: int = 32
) -> list[str]:
    """Sequential reference encoder (HF WordPiece semantics)."""
    if len(word) > max_word_len or not all(
        "!" <= c <= "~" for c in word
    ) or word == "":
        return [WP_UNK]
    starts, conts = _candidate_arrays(pieces)
    toks: list[str] = []
    rem = word
    while rem:
        cand = starts if not toks else conts
        m = next((t for t in cand if rem.startswith(t)), None)
        if m is None:
            return [WP_UNK]
        toks.append(m if not toks else "##" + m)
        rem = rem[len(m):]
    return toks


def test_greedy_longest_match_hand_checked(spark):
    pieces = [
        "un", "##aff", "##able", "##ab", "a", "u", "n", "f",
        "##f", "##a", "##b", "##l", "##e",
    ]
    df = spark.createDataFrame(
        [("unaffable",), ("fan",), ("zqx",), ("u",), ("x" * 33,)],
        ["word"],
    )
    got = {
        r["word"]: (r["wp_tokens"], r["is_unk"])
        for r in wordpiece_encode_words(df, pieces).collect()
    }
    # maximal munch: ##aff beats ##ab at position 2
    assert got["unaffable"] == (["un", "##aff", "##able"], False)
    # 'fan' -> f, ##a, then 'n' has no continuation piece -> UNK
    assert got["fan"] == ([WP_UNK], True)
    # unseen chars -> UNK; single known start char -> itself
    assert got["zqx"] == ([WP_UNK], True)
    assert got["u"] == (["u"], False)
    # over max_word_len -> UNK without attempting the fold
    assert got["x" * 33] == ([WP_UNK], True)


def test_non_ascii_word_is_unk(spark):
    df = spark.createDataFrame([("café",), ("ok",)], ["word"])
    got = {
        r["word"]: r["is_unk"]
        for r in wordpiece_encode_words(
            df, ["ok", "o", "k", "c", "a", "f", "##k", "##a", "##f"]
        ).collect()
    }
    assert got["café"] is True
    assert got["ok"] is False


def test_likelihood_scoring_differs_from_bpe():
    """The WordPiece argmax (count(ab)/(count(a)count(b))) must pick a
    DIFFERENT first merge than BPE's raw-count argmax on a corpus
    built for the distinction: pair (x, y) is most frequent but both
    symbols are ubiquitous; pair (q, z) is rarer but its symbols occur
    nowhere else, so its likelihood is higher."""
    from data_engineering_spark.operators.bpe import bpe_merge_loop

    # 'xy' 30x: pair (x,##y) count 30, count(x)=40, count(##y)=40
    # (each also appears alone in 'xa'/'ay' forms below)
    # 'qz' 3x: pair (q,##z) count 3, count(q)=3, count(##z)=3
    wf = [("xy", 30), ("xw", 10), ("vy", 10), ("qz", 3)]
    bpe = bpe_merge_loop(wf, 1)
    assert bpe == [("x", "y")]  # raw count argmax
    wp = wordpiece_merge_loop(wf, 1)
    # score(q,##z) = 3/(3*3) = 1/3 > score(x,##y) = 30/(40*40)
    assert "qz" in wp and "xy" not in wp  # likelihood argmax, not count


def test_trainer_matches_naive_reference():
    """The incremental trainer must equal a from-scratch recount
    implementation on a tie-heavy corpus (same contract as the BPE
    trainer test)."""
    from collections import Counter

    def naive(word_freqs, num_merges):
        words = [
            ([w[0]] + ["##" + c for c in w[1:]], f)
            for w, f in word_freqs
        ]
        merges = []
        for _ in range(num_merges):
            sym: Counter = Counter()
            pairs: Counter = Counter()
            for s, f in words:
                for x in s:
                    sym[x] += f
                for pr, c in Counter(zip(s[:-1], s[1:])).items():
                    pairs[pr] += c * f
            best = None
            for pr, c in pairs.items():
                if c < 2:
                    continue
                if best is None:
                    best = pr
                    continue
                lhs = c * sym[best[0]] * sym[best[1]]
                rhs = pairs[best] * sym[pr[0]] * sym[pr[1]]
                if lhs > rhs or (
                    lhs == rhs
                    and (
                        c > pairs[best]
                        or (c == pairs[best] and pr < best)
                    )
                ):
                    best = pr
            if best is None:
                break
            merges.append(best)
            joined = best[0] + best[1][2:]
            new_words = []
            for s, f in words:
                out, i = [], 0
                while i < len(s):
                    if (
                        i + 1 < len(s)
                        and s[i] == best[0]
                        and s[i + 1] == best[1]
                    ):
                        out.append(joined)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                new_words.append((out, f))
            words = new_words
        return [a + b[2:] for a, b in merges]

    wf = [
        ("abab", 5), ("aabb", 5), ("abba", 5), ("baba", 5),
        ("aaa", 7), ("bbb", 7), ("ab", 11), ("ba", 11), ("a", 3),
    ]
    got = wordpiece_merge_loop(wf, 8)
    base = sorted({w[0] for w, _ in wf}) + sorted(
        {"##" + c for w, _ in wf for c in w[1:]}
    )
    want_merged = naive(wf, 8)
    want = []
    seen = set()
    for p in base + want_merged:
        if p not in seen:
            seen.add(p)
            want.append(p)
    assert got == want


def test_fold_matches_python_encoder_random(spark):
    """JVM fold == sequential python greedy encoder over random words
    and a piece set with overlapping prefixes and regex metachars."""
    import random

    rng = random.Random(7)
    alphabet = "ab.*("
    pieces = ["a", "b", ".", "*", "("]
    pieces += ["##" + c for c in alphabet]
    extra = {"ab", "a.", ".*", "((", "ab*"}
    pieces += sorted(extra) + ["##" + e for e in sorted(extra)]
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(120)
    ] + ["", "café"]
    words = [w for w in words if w]  # empty never reaches encode
    df = spark.createDataFrame([(w,) for w in set(words)], ["word"])
    got = {
        r["word"]: r["wp_tokens"]
        for r in wordpiece_encode_words(df, pieces).collect()
    }
    for w in set(words):
        assert got[w] == py_greedy_encode(w, pieces), w


def test_doc_stats_arithmetic_and_empty_docs(spark):
    pieces = ["ab", "a", "b", "##a", "##b", "##ab"]
    docs = spark.createDataFrame(
        [
            (1, "ab ab aba"),
            (2, "   "),
            (3, "zq ab"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_wp_tokens"], r["n_unk_words"]
        )
        for r in wordpiece_doc_stats(docs, pieces).collect()
    }
    # 'ab' -> [ab] (1 tok); 'aba' -> ab, ##a (2 toks)
    assert got[1] == (3, 4, 0)
    assert got[2] == (0, 0, 0)  # whitespace-only doc retained
    # 'zq' -> UNK (unseen chars), 1 token
    assert got[3] == (2, 2, 1)


def test_train_on_spark_corpus_matches_fixture_seeder(spark):
    """wordpiece_train (Spark word count) == wordpiece_merge_loop fed
    by a direct python count of the same corpus."""
    from collections import Counter

    texts = [
        "the cat sat", "the cat", "a cat sat on the mat",
        "", "  ", "the the the",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    wf = Counter(
        w for t in texts for w in t.split() if w
    )
    want = wordpiece_merge_loop(sorted(wf.items()), 6)
    got = wordpiece_train(docs, num_merges=6)
    assert got == want


def test_no_python_in_encode_plan(spark):
    """The encode fold is JVM-only: no BatchEvalPython / ArrowEval
    nodes in the per-doc stats plan (the repo's hot-path policy)."""
    docs = spark.createDataFrame(
        [(1, "ab ba ab")], ["doc_id", "text"]
    )
    plan = (
        wordpiece_doc_stats(docs, ["a", "b", "##a", "##b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEval" not in plan


def test_trainer_property_random_vocabularies():
    """Incremental trainer == from-scratch recount on random
    vocabularies (heavy ties, repeated substrings, freq-1 hapaxes) —
    the same model-based contract as the fixed-corpus twin, driven by
    hypothesis. Pure python, no Spark."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def naive(word_freqs, num_merges):
        words = [
            ([w[0]] + ["##" + c for c in w[1:]], f)
            for w, f in word_freqs
        ]
        merged = []
        for _ in range(num_merges):
            sym: Counter = Counter()
            pairs: Counter = Counter()
            for s, f in words:
                for x in s:
                    sym[x] += f
                for pr, c in Counter(zip(s[:-1], s[1:])).items():
                    pairs[pr] += c * f
            best = None
            for pr, c in pairs.items():
                if c < 2:
                    continue
                if best is None:
                    best = pr
                    continue
                lhs = c * sym[best[0]] * sym[best[1]]
                rhs = pairs[best] * sym[pr[0]] * sym[pr[1]]
                if lhs > rhs or (
                    lhs == rhs
                    and (
                        c > pairs[best]
                        or (c == pairs[best] and pr < best)
                    )
                ):
                    best = pr
            if best is None:
                break
            merged.append(best)
            out_words = []
            for s, f in words:
                out, i = [], 0
                while i < len(s):
                    if (
                        i + 1 < len(s)
                        and s[i] == best[0]
                        and s[i + 1] == best[1]
                    ):
                        out.append(best[0] + best[1][2:])
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                out_words.append((out, f))
            words = out_words
        return [a + b[2:] for a, b in merged]

    words_st = st.lists(
        st.tuples(
            st.text(alphabet="abcXY", min_size=1, max_size=7),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )

    @given(words_st, st.integers(min_value=0, max_value=10))
    @settings(max_examples=120, deadline=None)
    def check(wf, nm):
        got = wordpiece_merge_loop(wf, nm)
        base = sorted({w[0] for w, _ in wf}) + sorted(
            {"##" + c for w, _ in wf for c in w[1:]}
        )
        want, seen = [], set()
        for p in base + naive(wf, nm):
            if p not in seen:
                seen.add(p)
                want.append(p)
        assert got == want

    check()


def test_contentless_pieces_rejected():
    """An empty start piece or a bare '##' marker would match without
    consuming characters — the fold must refuse them loudly instead of
    silently truncating tokens."""
    from data_engineering_spark.operators.wordpiece import (
        _candidate_arrays,
    )

    for bad in (["a", ""], ["a", "##"], ["", "##"]):
        with pytest.raises(ValueError, match="content"):
            _candidate_arrays(bad)


@pytest.mark.parametrize("nm", [0, 1])
def test_tiny_merge_counts(nm):
    """num_merges=0 yields just the base alphabet; 1 yields one merge
    output appended."""
    wf = [("aa", 5), ("ab", 2)]
    got = wordpiece_merge_loop(wf, nm)
    base = ["a", "##a", "##b"]
    if nm == 0:
        assert got == base
    else:
        assert got[: len(base)] == base and len(got) == len(base) + 1
