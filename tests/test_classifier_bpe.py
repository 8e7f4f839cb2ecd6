"""Hashed-feature linear classifier scoring + BPE pair induction."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_engineering_spark.operators.bpe import (
    bpe_pair_counts,
    bpe_top_pairs,
    word_frequencies,
)
from data_engineering_spark.operators.classifier import (
    classifier_filter_stats,
    linear_classifier_score,
    synthetic_weights,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- classifier -------------------------------------------------------


def test_linear_score_matches_hand_computation(spark):
    """Logit = bias + Σ count(feature) · weight[md5-bucket(feature)],
    recomputed independently in pure Python."""
    B, bias = 64, 7
    d = docs(spark, [(1, "a b a"), (2, "zz")])
    w = synthetic_weights(spark, B, seed="t", scale=50)
    got = {
        r["doc_id"]: (r["logit"], r["label"])
        for r in linear_classifier_score(
            d, w, num_buckets=B, bias=bias
        ).collect()
    }

    def weight(bucket: int) -> int:
        return _h60(f"{bucket}|t") % 101 - 50

    def logit(feats: list[str]) -> int:
        return bias + sum(weight(_h60(f) % B) for f in feats)

    want1 = logit(["a", "b", "a", "a b", "b a"])
    want2 = logit(["zz"])
    assert got == {1: (want1, want1 > 0), 2: (want2, want2 > 0)}


def test_empty_text_scores_bias(spark):
    """Unscorable documents still get a row (logit = bias) — dropping
    them would corrupt downstream keep/drop accounting."""
    d = docs(spark, [(1, "   "), (2, ""), (3, "word")])
    w = synthetic_weights(spark, 32, seed="e")
    got = {
        r["doc_id"]: r["logit"]
        for r in linear_classifier_score(d, w, num_buckets=32, bias=-3)
        .collect()
    }
    assert got[1] == -3 and got[2] == -3
    assert len(got) == 3


def test_missing_weight_buckets_weigh_zero(spark):
    d = docs(spark, [(1, "only")])
    w = spark.createDataFrame([(0, 99)], "bucket long, weight long")
    b = _h60("only") % 16
    got = linear_classifier_score(d, w, num_buckets=16).collect()[0]
    assert got["logit"] == (99 if b == 0 else 0)


def test_weight_table_is_broadcast(spark):
    d = docs(spark, [(1, "a b")])
    w = synthetic_weights(spark, 128)
    plan = linear_classifier_score(d, w, num_buckets=128)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_filter_stats(spark):
    d = spark.createDataFrame(
        [(1, "x", "en"), (2, "y", "en"), (3, "z", "de")],
        "doc_id long, text string, lang string",
    )
    scored = spark.createDataFrame(
        [(1, 5, True), (2, -2, False), (3, 9, True)],
        "doc_id long, logit long, label boolean",
    )
    got = {
        r["lang"]: (r["n_docs"], r["n_kept"], r["sum_logit"])
        for r in classifier_filter_stats(scored, d, ["lang"]).collect()
    }
    assert got == {"en": (2, 1, 3), "de": (1, 1, 9)}


# -- BPE pair induction ------------------------------------------------


def test_word_frequencies_ascii_filter(spark):
    d = docs(spark, [(1, "ab ab café"), (2, " ab  x ")])
    got = {
        r["word"]: r["freq"] for r in word_frequencies(d).collect()
    }
    assert got == {"ab": 3, "x": 1}  # café has a non-ASCII char


def test_pair_counts_hand_checked(spark):
    v = spark.createDataFrame(
        [("abab", 2), ("ba", 3), ("x", 5)], "word string, freq long"
    )
    got = {
        r["pair"]: (r["n_words"], r["total"])
        for r in bpe_pair_counts(v).collect()
    }
    # abab: ab x2, ba x1; ba: ba x1; x: no pairs (filtered, no phantom
    # sequence(1,0) pair)
    assert got == {"ab": (1, 4), "ba": (2, 5)}


def test_top_pairs_deterministic_order(spark):
    d = docs(spark, [(1, "aaa aaa bb"), (2, "bb aaa")])
    rows = bpe_top_pairs(d, k=2).collect()
    # aa appears twice per "aaa" (3 words) = 6; bb once per "bb" (2) = 2
    assert [(r["pair"], r["total"]) for r in rows] == [("aa", 6), ("bb", 2)]


def test_single_char_words_yield_no_pairs(spark):
    d = docs(spark, [(1, "a b c d")])
    assert bpe_top_pairs(d, k=10).count() == 0


# -- prototypicality pruning -------------------------------------------


def test_prototype_prune_hand_checked(spark):
    """2 seeds on the axes; 6 unit-ish vectors with known dots — ranks
    and the 50% cut recomputed by hand."""
    import pytest

    from data_engineering_spark.operators.similarity import (
        prototype_prune,
    )

    rows = [
        (0, [1.0, 0.0]),   # seed A
        (1, [0.0, 1.0]),   # seed B
        (2, [0.9, 0.1]),   # A, dot .9
        (3, [0.8, 0.2]),   # A, dot .8
        (4, [0.1, 0.9]),   # B, dot .9
        (5, [0.2, 0.8]),   # B, dot .8
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["id"]: (r["seed_id"], r["rank"], r["n_cluster"], r["pruned"])
        for r in prototype_prune(df, (0, 1), prune_frac=0.5).collect()
    }
    # cluster A = {0 (dot 1.0), 2 (.9), 3 (.8)}: floor(3*.5)=1 pruned
    assert got[0] == (0, 1, 3, True)
    assert got[2] == (0, 2, 3, False)
    assert got[3] == (0, 3, 3, False)
    # cluster B = {1, 4, 5}
    assert got[1] == (1, 1, 3, True)
    assert got[4] == (1, 2, 3, False)
    assert got[5] == (1, 3, 3, False)

    with pytest.raises(ValueError, match="prune_frac"):
        prototype_prune(df, (0, 1), prune_frac=1.0)


def test_bpe_train_matches_naive_reference(spark):
    """The incremental-index trainer must equal a naive recount-
    everything implementation on assorted corpora (same greedy rule:
    max weighted pair count, ties to the lexicographically smallest)."""
    from collections import Counter

    from data_engineering_spark.operators.bpe import bpe_train

    def naive(word_freqs, num_merges):
        words = [(list(w), f) for w, f in word_freqs.items()]
        merges = []
        for _ in range(num_merges):
            counts = Counter()
            for sym, f in words:
                for pr in zip(sym[:-1], sym[1:]):
                    counts[pr] += f
            cands = [(c, pr) for pr, c in counts.items() if c >= 2]
            if not cands:
                break
            # max by count then LEX SMALLEST pair
            best_c = max(c for c, _ in cands)
            pr = min(p for c, p in cands if c == best_c)
            merges.append(pr)
            joined = pr[0] + pr[1]
            nw = []
            for sym, f in words:
                out, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pr:
                        out.append(joined); i += 2
                    else:
                        out.append(sym[i]); i += 1
                nw.append((out, f))
            words = nw
        return merges

    corpora = [
        {"low": 5, "lower": 2, "newest": 6, "widest": 3},
        {"aaaa": 3, "aaab": 2, "abab": 4},
        {"xy": 1, "yz": 1},          # all pairs count 1 -> no merges
        {"abcabc": 2, "bca": 5, "cab": 1, "aa": 7},
    ]
    for wf in corpora:
        text = " ".join(w for w, f in wf.items() for _ in range(f))
        d = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = bpe_train(d, num_merges=8)
        want = naive(wf, 8)
        assert got == want, (wf, got, want)


def test_bpe_train_vocab_bound(spark):
    """The driver-collect bound stays LOUD when the frequency floor is
    not allowed to escalate (max_floor=1 pins the r6-era behavior)."""
    import pytest

    from data_engineering_spark.operators.bpe import bpe_train

    d = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train(d, max_vocab_rows=3, max_floor=1)


def test_bpe_train_degrades_to_frequency_floor(spark):
    """VERDICT r7 #2: an over-vocab corpus trains on the frequent tail
    (auto-doubling min-frequency floor) instead of refusing — and the
    floor-filtered training equals bpe_merge_loop over the explicitly
    filtered vocabulary."""
    from data_engineering_spark.operators.bpe import (
        bpe_merge_loop,
        bpe_train,
    )

    # 6 hapax words + 3 frequent words: vocab=9 > max_vocab_rows=4,
    # floor escalates to 2, leaving the 3 frequent words (fits)
    text = "u1 u2 u3 u4 u5 u6 " + "abab cdcd abab cdcd efef efef"
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = bpe_train(d, num_merges=5, max_vocab_rows=4)
    want = bpe_merge_loop(
        [("abab", 2), ("cdcd", 2), ("efef", 2)], 5
    )
    assert got == want


def test_bpe_train_min_freq_equals_filtered_twin(spark):
    """Explicit min_freq on the benchmark corpus == the merge loop over
    the DuckDB word count filtered at the same floor (the fixture-twin
    contract survives the pre-filter)."""
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.bpe import (
        bpe_merge_loop,
        bpe_train,
    )
    from data_engineering_spark.queries import _fixtures as FX

    sf = "/root/testdata/sf0.001"
    vocab, _n = FX._bpe_word_freqs_duckdb(sf)
    twin = bpe_merge_loop(
        [(w, f) for w, f in vocab if f >= 2], 25
    )
    d = load_table(spark, sf, "documents")
    assert bpe_train(d, num_merges=25, min_freq=2) == twin


# -- perplexity filtering ----------------------------------------------


def test_lm_perplexity_matches_python_model(spark):
    """Hashed bigram LM + doc scoring vs an independent pure-python
    computation (md5 buckets so python can recompute them)."""
    import math

    from data_engineering_spark.operators.lm import (
        lm_perplexity,
        train_bigram_lm,
    )

    B = 128
    target = docs(spark, [(1, "the cat sat"), (2, "the cat ran far")])
    raw = docs(spark, [(10, "the cat sat"), (11, "zz qq"), (12, "one")])

    lm = train_bigram_lm(target, num_buckets=B, bucket_hash="md5")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"], r["ppl"])
        for r in lm_perplexity(
            raw, lm, num_buckets=B, bucket_hash="md5"
        ).collect()
    }

    def bucket(s):
        return _h60(s) % B

    counts = {}
    for t in ["the cat sat", "the cat ran far"]:
        toks = t.split()
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for f_ in feats:
            counts[bucket(f_)] = counts.get(bucket(f_), 0) + 1

    def score(text):
        toks = text.split()
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            return (0, None, None)
        nll = -sum(
            math.log(counts.get(bucket(f"{a} {b}"), 0) + 1.0)
            - math.log(counts.get(bucket(a), 0) + float(B))
            for a, b in bgs
        )
        return (len(bgs), nll, math.exp(nll / len(bgs)))

    for did, text in [(10, "the cat sat"), (11, "zz qq"), (12, "one")]:
        n, nll, ppl = score(text)
        gn, gnll, gppl = got[did]
        assert gn == n
        if nll is None:
            assert gnll is None and gppl is None
        else:
            assert abs(gnll - nll) < 1e-9 and abs(gppl - ppl) < 1e-9
    # in-target doc scores lower perplexity than out-of-vocab junk
    assert got[10][2] < got[11][2]


def test_classifier_property_random_text(spark):
    """Random ASCII-ish corpora vs the pure-python model — pins
    tokenization (trim + \\s+ split, Java \\s is ASCII-only so the
    alphabet avoids unicode whitespace), md5 bucketing, and integer
    aggregation under repeated tokens, empty and whitespace-only text."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    B, bias, seed = 32, -5, "p"

    alphabet = st.sampled_from(list("ab δ日 "))
    texts = st.lists(
        st.text(alphabet=alphabet, min_size=0, max_size=12),
        min_size=1,
        max_size=5,
    )

    def weight(bucket):
        return _h60(f"{bucket}|{seed}") % 101 - 50

    def model(text):
        toks = text.strip().split() if text.strip() else []
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return bias + sum(weight(_h60(f) % B) for f in feats)

    @given(texts)
    @settings(max_examples=8, deadline=None)
    def check(ts):
        d = docs(spark, list(enumerate(ts)))
        w = synthetic_weights(spark, B, seed=seed, scale=50)
        got = {
            r["doc_id"]: r["logit"]
            for r in linear_classifier_score(
                d, w, num_buckets=B, bias=bias
            ).collect()
        }
        want = {i: model(t) for i, t in enumerate(ts)}
        assert got == want, (ts, got, want)

    check()


# -- BPE encode/apply -------------------------------------------------


def _py_encode(word: str, merges) -> list[str]:
    """Reference encoder: merges applied sequentially in training
    order, each pass replacing non-overlapping occurrences left to
    right (Sennrich apply_bpe semantics)."""
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_encode_matches_python_reference(spark):
    """The JVM sentinel-fold segmentation equals the sequential python
    encoder for every vocab word, including the overlap cases the
    plain-replace semantics must get right ('aaaa' -> aa aa,
    'aaa' -> aa a)."""
    from data_engineering_spark.operators.bpe import (
        bpe_encode_words,
        bpe_train,
    )

    d = docs(
        spark,
        [
            (1, "low lower lowest low low aaaa aaa"),
            (2, "new newer newest news new"),
            (3, "wide wider widest low new"),
        ],
    )
    merges = bpe_train(d, num_merges=25)
    assert merges, "trainer found no merges"
    vocab = spark.createDataFrame(
        [
            ("low",),
            ("lowest",),
            ("newer",),
            ("aaaa",),
            ("aaa",),
            ("x",),
            ("widest",),
        ],
        ["word"],
    )
    got = {
        r["word"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
        for r in bpe_encode_words(vocab, merges).collect()
    }
    for w, (toks, n) in got.items():
        ref = _py_encode(w, merges)
        assert toks == ref, (w, toks, ref)
        assert n == len(ref)


def test_bpe_encode_non_ascii_is_single_unknown(spark):
    """Words outside the training alphabet encode as one unknown
    token (count 1), never through the sentinel machinery."""
    from data_engineering_spark.operators.bpe import bpe_encode_words

    vocab = spark.createDataFrame(
        [("héllo",), ("日本語",), ("ok",)], ["word"]
    )
    got = {
        r["word"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
        for r in bpe_encode_words(vocab, [("o", "k")]).collect()
    }
    assert got["héllo"] == (["héllo"], 1)
    assert got["日本語"] == (["日本語"], 1)
    assert got["ok"] == (["ok"], 1)


def test_bpe_doc_token_counts_hand_checked(spark):
    """Per-doc totals: sum over word occurrences of encoded lengths;
    empty docs keep a zero row."""
    from data_engineering_spark.operators.bpe import (
        bpe_doc_token_counts,
    )

    d = docs(spark, [(1, "ab ab cd"), (2, ""), (3, "ab naïve")])
    merges = [("a", "b")]
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_doc_token_counts(d, merges).collect()
    }
    # doc1: ab(1)+ab(1)+cd(2)=4; doc2: empty; doc3: ab(1)+unk(1)=2
    assert got == {1: (3, 4), 2: (0, 0), 3: (2, 2)}


def test_bpe_pattern_roundtrip():
    from data_engineering_spark.operators.bpe import (
        merge_patterns,
        patterns_to_merges,
    )

    merges = [("a", "b"), ("ab", "c"), ("x", "yz")]
    assert patterns_to_merges(merge_patterns(merges)) == merges


def test_bpe_fixture_twin_equals_spark_trainer(spark):
    """The DuckDB-count + bpe_merge_loop fixture seeder must produce
    the EXACT merge list bpe_train derives from the Spark word count
    (the oracle-integrity contract: shared parameters, not a shared
    shortcut)."""
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.bpe import (
        bpe_merge_loop,
        bpe_train,
        merge_patterns,
    )
    from data_engineering_spark.queries import _fixtures as FX

    sf = "/root/testdata/sf0.001"
    vocab, _n = FX._bpe_word_freqs_duckdb(sf)
    twin = merge_patterns(bpe_merge_loop(vocab, FX.BPE_NUM_MERGES))
    d = load_table(spark, sf, "documents")
    via_spark = merge_patterns(
        bpe_train(d, num_merges=FX.BPE_NUM_MERGES)
    )
    assert twin == via_spark


def test_bpe_token_ids_reconstruct_words(spark):
    """Token-id streams are lossless for in-alphabet words: mapping
    ids back through the vocabulary and concatenating within (doc,
    wpos) must reproduce every ASCII word exactly; out-of-alphabet
    words map to the single <unk> id 0."""
    from data_engineering_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab_ids,
    )

    d = docs(
        spark,
        [(1, "low lower lowest"), (2, "héllo low"), (3, "")],
    )
    merges = bpe_train(d, num_merges=10)
    id2tok = {i: t for t, i in bpe_vocab_ids(merges)}
    rows = bpe_encode_ids(d, merges).collect()
    by_word: dict[tuple, list] = {}
    for r in rows:
        by_word.setdefault((r["doc_id"], r["wpos"]), []).append(
            (r["tpos"], r["token_id"])
        )
    originals = {
        (did, i): w
        for did, text in [(1, "low lower lowest"), (2, "héllo low")]
        for i, w in enumerate(text.split())
    }
    assert set(by_word) == set(originals)
    for key, toks in by_word.items():
        word = originals[key]
        ids = [t for _, t in sorted(toks)]
        if word.isascii():
            assert "".join(id2tok[i] for i in ids) == word
        else:
            assert ids == [0]


def test_bpe_encode_property_random_merges(spark):
    """Property: for RANDOM printable-ASCII vocabularies and RANDOM
    (even degenerate) merge lists — overlapping pairs, merges of
    merges, merges that never fire, single-char repeats — the JVM
    sentinel-fold equals the sequential python encoder on every word.
    Catches exactly the class of replace-semantics bug the plain-fold
    design bets against (overlap handling, boundary crossing,
    pattern-in-replacement collisions)."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_engineering_spark.operators.bpe import bpe_encode_words

    alphabet = "ab!~cz.*$"  # incl. regex metachars — replace is plain

    words_st = st.lists(
        st.text(alphabet=alphabet, min_size=1, max_size=8),
        min_size=1,
        max_size=12,
        unique=True,
    )

    def merges_from(words, seed):
        """Plausible + adversarial merge list derived from the words:
        adjacent pairs that occur, then synthetic merges-of-merges."""
        rng = random.Random(seed)
        pairs = sorted(
            {(w[i], w[i + 1]) for w in words for i in range(len(w) - 1)}
        )
        rng.shuffle(pairs)
        merges = pairs[:6]
        # merges of merges: join two earlier results
        for _ in range(3):
            if len(merges) >= 2:
                a = rng.choice(merges)
                b = rng.choice(merges)
                merges.append((a[0] + a[1], b[0] + b[1]))
        return merges

    @given(words=words_st, seed=st.integers(min_value=0, max_value=99))
    @settings(max_examples=12, deadline=None)
    def check(words, seed):
        merges = merges_from(words, seed)
        vocab = spark.createDataFrame([(w,) for w in words], ["word"])
        got = {
            r["word"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
            for r in bpe_encode_words(vocab, merges).collect()
        }
        for w in words:
            ref = _py_encode(w, merges)
            assert got[w] == (ref, len(ref)), (w, merges, got[w], ref)

    check()


def test_bpe_vocab_ids_dedupe_duplicate_token_strings(spark):
    """ADVICE r7: two merges concatenating to the same string (('ab','c')
    and ('a','bc') -> 'abc') must not duplicate the vocabulary key —
    first occurrence wins, later ids are holes — or the encode join
    would fan out (doc_id, wpos, tpos) rows."""
    from data_engineering_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_vocab_ids,
    )

    merges = [("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc")]
    vocab = bpe_vocab_ids(merges)
    toks = [t for t, _ in vocab]
    assert len(toks) == len(set(toks))
    by_tok = dict(vocab)
    assert by_tok["abc"] == 95 + 2  # ('ab','c') came first
    assert 95 + 3 not in {i for _, i in vocab}  # hole at the dup id

    d = spark.createDataFrame(
        [(1, "abc abc")], "doc_id long, text string"
    )
    rows = bpe_encode_ids(d, merges).collect()
    # fold: ab -> abc; one token per word, NO join fan-out
    assert len(rows) == 2
    assert {r["token_id"] for r in rows} == {95 + 2}
