"""Product-quantization ANN: recall, determinism, compression shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.pq import pq_encode, pq_topk, pq_train
from data_engineering_spark.operators.similarity import cosine_topk

SF = "/root/testdata/sf0.01"


def test_pq_codes_shape_and_determinism(spark):
    e = load_table(spark, SF, "embeddings")
    cb = pq_train(e, m=8, k_codes=16)
    assert cb.count() <= 8 * 16
    enc = pq_encode(e, cb)
    rows = enc.collect()
    assert len(rows) == e.count()
    for r in rows[:20]:
        assert len(r["__codes"]) == 8
        assert all(0 <= c < 16 for c in r["__codes"])
    again = {r["neighbor_id"]: r["__codes"] for r in pq_encode(e, cb).collect()}
    assert all(again[r["neighbor_id"]] == r["__codes"] for r in rows)


def test_pq_topk_recall_vs_exact(spark):
    """ADC over 16x64 codebooks must recover most exact top-5 neighbors
    — and never report a cosine above 1 + quantization slack. (These
    embeddings are near-random, the hardest case for PQ: measured
    recall 0.33 at m=8/k=32 up to 0.83 at m=32/k=64; m=16/k=64 lands
    0.65 — clustered real-world embeddings do much better at lower m.)
    """
    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    cb = pq_train(e, m=16, k_codes=64)
    enc = pq_encode(e, cb)
    approx = pq_topk(enc, cb, q, k=5).collect()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(e, q, k=5).collect()
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(got & exact) / len(exact) >= 0.5
    assert all(r["cosine_r"] <= 1.2 for r in approx)
    assert all(r["neighbor_id"] != r["query_id"] for r in approx)
    # full result shape: 5 ranked rows per query
    per_q = {}
    for r in approx:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_pq_train_on_sample_still_encodes_everything(spark):
    e = load_table(spark, SF, "embeddings")
    cb = pq_train(e, m=4, k_codes=8, sample_fraction=0.3)
    enc = pq_encode(e, cb)
    assert enc.count() == e.count()


def test_ivf_add_grows_index_and_serves(spark):
    """Incremental maintenance: index 80% of the corpus, ivf_add the
    rest, and the served results must equal a from-scratch index built
    with the SAME centroids (assignment is deterministic given the
    coarse quantizer)."""
    from pyspark.sql import functions as F

    from data_engineering_spark.operators.similarity import (
        build_ivf_index,
        ivf_add,
        ivf_topk_from_index,
    )

    e = load_table(spark, SF, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    delta = e.filter(F.col("vec_id") % 5 == 0)
    cents, assigned = build_ivf_index(base, n_clusters=8)
    grown = assigned.unionByName(ivf_add(cents, delta))
    assert grown.count() == e.count()
    # every delta vector landed in a valid cluster
    clusters = {r["cluster"] for r in cents.collect()}
    got = {r["__cluster"] for r in ivf_add(cents, delta).collect()}
    assert got <= clusters

    q = e.filter(F.col("vec_id") < 5)
    served = ivf_topk_from_index(cents, grown, q, k=3).collect()
    per_q = {}
    for r in served:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())
    # sq8 variant emits codes, not floats
    add_q = ivf_add(cents, delta, quantized=True)
    assert "__q" in add_q.columns and "__cv" not in add_q.columns


def test_ivf_pq_topk_recall(spark):
    """The composed IVF-PQ index (probe pruning x code compression)
    must still recover a solid share of exact neighbors. Offline
    measurement on these near-random embeddings: 0.625 at
    m=16/k=64/probe 8 of 16 (PQ error dominates; probing costs ~0)."""
    from pyspark.sql import functions as F

    from data_engineering_spark.operators.pq import (
        build_ivf_pq_index,
        ivf_pq_topk,
    )

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    cents, cb, encoded = build_ivf_pq_index(
        e, n_clusters=16, m=16, k_codes=64
    )
    approx = ivf_pq_topk(cents, cb, encoded, q, k=5, n_probe=8).collect()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(e, q, k=5).collect()
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(got & exact) / len(exact) >= 0.45
    per_q = {}
    for r in approx:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    assert all(r["neighbor_id"] != r["query_id"] for r in approx)


def test_pq_topk_rejects_unbounded_query_side(spark):
    """The bounded-query contract is enforced: a query frame past the
    cap raises instead of silently landing corpus-scale data on the
    driver."""
    import pytest as _pytest

    e = load_table(spark, SF, "embeddings")
    cb = pq_train(e, m=4, k_codes=8)
    enc = pq_encode(e, cb)
    with _pytest.raises(ValueError, match="max_query_rows"):
        pq_topk(enc, cb, e, k=3, max_query_rows=10)


def test_pq_encode_rejects_colliding_carry(spark):
    """carry names that collide with the fixed output schema (or
    repeat) raise a clear ValueError instead of failing obscurely
    inside mapInPandas with a duplicate-column batch."""
    import pytest as _pytest

    e = load_table(spark, SF, "embeddings")
    cb = pq_train(e, m=4, k_codes=8)
    for bad in (
        (("neighbor_id", "long"),),
        (("__codes", "array<int>"),),
        (("c", "int"), ("c", "int")),
    ):
        with _pytest.raises(ValueError, match="carry"):
            pq_encode(e, cb, carry=bad)


def test_ivf_pq_refine_recall(spark):
    """The exact re-rank stage (r6 verdict item 6): over-fetch
    k·refine_factor ADC candidates, re-score their TRUE vectors, keep
    top-k. Refine must eliminate the PQ-error term entirely: measured
    recall@5 at n_probe=8 is 0.575 bare vs 0.825 refined — and 0.825
    IS the probe ceiling at that budget on these near-random
    embeddings (refine_factor 8 and 16 plateau there; the remaining
    misses live in unprobed clusters, unreachable by any re-rank).
    At n_probe=n_clusters, refined recall must be PERFECT (the full
    candidate set is probed, exact scores decide) — the two-point
    check that separates 'refine removed PQ error' from 'probe
    budget'. Refined scores are exact cosines, so they must agree
    with the exact top-k scores on every hit."""
    from pyspark.sql import functions as F

    from data_engineering_spark.operators.pq import (
        build_ivf_pq_index,
        ivf_pq_topk,
    )

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    cents, cb, encoded = build_ivf_pq_index(
        e, n_clusters=16, m=16, k_codes=64
    )
    refined = ivf_pq_topk(
        cents, cb, encoded, q, k=5, n_probe=8,
        refine=e, refine_factor=4,
    ).collect()
    exact_rows = cosine_topk(e, q, k=5).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    got = {(r["query_id"], r["neighbor_id"]) for r in refined}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"refine recall {recall} < 0.8"
    # full-probe + refine at a candidate budget wide enough that every
    # true neighbor survives the ADC pre-rank (rf=8 measured; rf=4
    # drops 2/40 whose ADC rank exceeds 20): recall must be exactly
    # 1.0 — only probe misses could lose a neighbor and every cluster
    # is probed, so any miss would be a refine bug
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_pq_topk(
            cents, cb, encoded, q, k=5, n_probe=16,
            refine=e, refine_factor=8,
        ).collect()
    }
    assert len(full & exact) / len(exact) == 1.0
    # exact scores on the overlap (same zip_with cosine both sides)
    escore = {
        (r["query_id"], r["neighbor_id"]): r["cosine_r"]
        for r in exact_rows
    }
    for r in refined:
        key = (r["query_id"], r["neighbor_id"])
        if key in escore:
            assert abs(r["cosine_r"] - escore[key]) < 1e-9
    per_q = {}
    for r in refined:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    assert all(r["neighbor_id"] != r["query_id"] for r in refined)
