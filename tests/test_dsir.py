"""DSIR importance weights: Spark vs independent numpy recompute
(oracle-exempt — log() is outside the cross-engine oracle policy)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_engineering_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
    hashed_ngram_buckets,
)

B = 512


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox naps under the old tree"),
        (3, "stock market prices fell sharply in early trading"),
        (4, "bond market yields rose in late trading today"),
        (5, "the lazy dog naps under the quick brown fox"),
        (6, "market trading moved prices in the early session"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _numpy_weights(raw_rows, tgt_rows):
    """Independent recompute from the (doc,bucket,c) feature rows."""

    def dist(rows):
        cb: dict[int, int] = {}
        for _, b, c in rows:
            cb[b] = cb.get(b, 0) + c
        n = sum(cb.values())
        return cb, n

    raw_cb, raw_n = dist(raw_rows)
    tgt_cb, tgt_n = dist(tgt_rows)
    out: dict[int, float] = {}
    for d, b, c in raw_rows:
        lt = math.log((tgt_cb.get(b, 0) + 1.0) / (tgt_n + B))
        lr = math.log((raw_cb.get(b, 0) + 1.0) / (raw_n + B))
        out[d] = out.get(d, 0.0) + c * (lt - lr)
    return out


def test_log_weights_match_numpy(spark, corpus):
    target = corpus.filter(F.col("doc_id").isin(1, 2, 5))  # fox domain
    raw_rows = [
        (r["doc"], r["bucket"], r["c"])
        for r in hashed_ngram_buckets(corpus, num_buckets=B).collect()
    ]
    tgt_rows = [
        (r["doc"], r["bucket"], r["c"])
        for r in hashed_ngram_buckets(target, num_buckets=B).collect()
    ]
    want = _numpy_weights(raw_rows, tgt_rows)
    got = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(corpus, target, num_buckets=B).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_feature_counts_shape(spark, corpus):
    """Every doc contributes exactly (2*len - 1) n-gram instances
    (len unigrams + len-1 bigrams)."""
    rows = hashed_ngram_buckets(corpus, num_buckets=B).groupBy("doc").agg(
        F.sum("c").alias("total")
    )
    got = {r["doc"]: r["total"] for r in rows.collect()}
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for d, t in texts.items():
        n = len(t.split())
        assert got[d] == 2 * n - 1


def test_target_docs_rank_higher(spark, corpus):
    """Docs from the target domain must carry larger importance weights
    than off-domain docs."""
    target = corpus.filter(F.col("doc_id").isin(1, 2, 5))
    w = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(corpus, target, num_buckets=B).collect()
    }
    assert min(w[1], w[2], w[5]) > max(w[3], w[4], w[6])


def test_gumbel_select_deterministic_and_bounded(spark, corpus):
    target = corpus.filter(F.col("doc_id").isin(1, 2, 5))
    s1 = dsir_select(corpus, target, k=3, num_buckets=B).collect()
    s2 = dsir_select(corpus, target, k=3, num_buckets=B).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    assert len(s1) == 3
    # keys strictly ordered, finite
    keys = [r["gumbel_key"] for r in s1]
    assert all(np.isfinite(keys)) and keys == sorted(keys, reverse=True)


def test_target_subset_path_identical(spark, corpus):
    """target_subset=True (features sliced from the single corpus scan)
    must produce exactly the two-scan path's weights."""
    target = corpus.filter(F.col("doc_id").isin(1, 2, 5))
    two_scan = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(corpus, target, num_buckets=B).collect()
    }
    sliced = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(
            corpus, target, num_buckets=B, target_subset=True
        ).collect()
    }
    assert set(sliced) == set(two_scan)
    for d in two_scan:
        # same math; only double partial-sum merge order differs
        assert sliced[d] == pytest.approx(two_scan[d], abs=1e-9)


def test_bucket_bound_enforced(spark, corpus):
    """num_buckets is the broadcastability contract (the bucket model
    is broadcast to the corpus scan); out-of-bound values must fail
    loudly at every API that accepts it (r6 verdict item 7)."""
    from data_engineering_spark.operators.classifier import (
        linear_classifier_score,
        synthetic_weights,
    )
    from data_engineering_spark.operators.dsir import (
        MAX_BROADCAST_BUCKETS,
    )
    from data_engineering_spark.operators.lm import lm_perplexity

    too_big = MAX_BROADCAST_BUCKETS + 1
    w = synthetic_weights(spark, 64)
    lm = spark.createDataFrame([(0, 3)], ["bucket", "c"])
    for bad in (0, -5, too_big):
        with pytest.raises(ValueError, match="num_buckets"):
            hashed_ngram_buckets(corpus, num_buckets=bad)
        with pytest.raises(ValueError, match="num_buckets"):
            dsir_log_weights(corpus, corpus.limit(2), num_buckets=bad)
        with pytest.raises(ValueError, match="num_buckets"):
            lm_perplexity(corpus, lm, num_buckets=bad)
        with pytest.raises(ValueError, match="num_buckets"):
            linear_classifier_score(corpus, w, num_buckets=bad)
    # the bound itself is accepted (construction only — no execution)
    hashed_ngram_buckets(corpus, num_buckets=MAX_BROADCAST_BUCKETS)
