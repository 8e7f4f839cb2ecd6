"""Error-bound checks for the two permanently-no-oracle driver rows
(VERDICT r7 #2 / next-round item 2).

The driver's hash compare can never green-light these queries —
`q_events_approx_aggregates` is sketch-based (HLL++/percentile_approx
register layouts are engine-specific) and `q_doc_lm_perplexity` ends
in log/exp (outside the cross-engine oracle policy). These tests
convert the permanent gray rows into checkable properties on the real
testdata:

- the REGISTERED approx query vs exact answers, within each sketch's
  documented error bound;
- the REGISTERED perplexity query vs a driver-side float twin that
  recomputes the log/exp arithmetic in python from the same per-bigram
  integer lookups (the integer path itself — tokenize → buckets → LM
  counts → lookups — is hash-verified against DuckDB by
  q_doc_lm_bigram_stats's oracle, so the only unchecked piece WAS the
  float math; after this test, nothing is unchecked).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.queries import QUERIES


def test_approx_aggregates_within_sketch_bounds(spark, sf_dir):
    """q_events_approx_aggregates (the registered entry, not a
    re-derivation): KMV distinct within 5x its ~1/sqrt(k-2) rsd
    (exact below k distinct — every test sf), each sampled percentile
    between the order statistics (p ± 5·sqrt(p(1-p)/s))·n of the
    exact sorted values, s = min(sample_k, n) (exact when the sample
    covers the group). The estimates are deterministic now (full hash
    oracle, VERDICT r10 #3b) — this test keeps ACCURACY checked on
    top of reproducibility."""
    got = {
        r["event_type"]: r
        for r in QUERIES["q_events_approx_aggregates"](
            spark, sf_dir
        ).collect()
    }
    e = load_table(spark, sf_dir, "events")
    exact_distinct = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    values = {}
    for r in e.select("event_type", "value").collect():
        values.setdefault(r["event_type"], []).append(r["value"])

    assert set(got) == set(exact_distinct)
    for et, row in got.items():
        n_exact = exact_distinct[et]
        assert abs(row["approx_users"] - n_exact) <= max(
            2, 0.05 * n_exact
        ), (et, row["approx_users"], n_exact)

        vals = sorted(values[et])
        n = len(vals)
        assert row["n"] == n
        s = min(2048, n)  # _APX_K sample size
        for p, col in [
            (0.50, "value_p50"),
            (0.95, "value_p95"),
            (0.99, "value_p99"),
        ]:
            delta = 5.0 * math.sqrt(p * (1 - p) / s)
            lo_i = max(0, math.floor((p - delta) * n) - 1)
            hi_i = min(n - 1, math.ceil((p + delta) * n) + 1)
            assert vals[lo_i] <= row[col] <= vals[hi_i], (
                et,
                col,
                row[col],
                vals[lo_i],
                vals[hi_i],
            )


def test_lm_perplexity_matches_float_twin(spark, sf_dir):
    """operators/lm.lm_perplexity (the float API — the registered
    q_doc_lm_perplexity entry is now the nano-nat integer form with a
    full hash oracle, VERDICT r10 #3a) vs a python float twin at 1e-9
    RELATIVE tolerance on the full testdata corpus.

    The twin consumes the same per-bigram (c12, c1) integer lookups
    the operator's plan produces (operators/lm._bigram_keyed — that
    integer path is DuckDB-oracled via q_doc_lm_bigram_stats) and
    recomputes nll = -Σ[ln(c12+1) − ln(c1+B)] and ppl = exp(nll/n)
    with python's libm. Spark evaluates the same expressions with
    java.lang.Math — agreement at 1e-9 over every document checks the
    whole transcendental tail that the float API leaves unhashed."""
    B = 8192

    from data_engineering_spark.operators.lm import (
        _bigram_keyed,
        lm_perplexity,
        train_bigram_lm,
    )

    d = load_table(spark, sf_dir, "documents")
    lm = train_bigram_lm(d.filter(F.col("lang") == "en"))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"], r["ppl"])
        for r in lm_perplexity(d, lm).collect()
    }
    keyed, joint, ctx = _bigram_keyed(
        d, lm, "doc_id", "text", B, "xxhash64"
    )
    lookups = (
        keyed.join(F.broadcast(joint), "b12", "left")
        .join(F.broadcast(ctx), "b1", "left")
        .select("doc", "c12", "c1")
        .collect()
    )
    twin_nll: dict = {}
    twin_n: dict = {}
    for r in lookups:
        c12 = r["c12"] or 0
        c1 = r["c1"] or 0
        twin_nll[r["doc"]] = twin_nll.get(r["doc"], 0.0) - (
            math.log(c12 + 1.0) - math.log(c1 + float(B))
        )
        twin_n[r["doc"]] = twin_n.get(r["doc"], 0) + 1

    assert len(got) == d.count()
    checked = 0
    for doc_id, (n, nll, ppl) in got.items():
        if n == 0:
            assert doc_id not in twin_n
            assert nll is None and ppl is None
            continue
        t_nll = twin_nll[doc_id]
        t_ppl = math.exp(t_nll / n)
        assert twin_n[doc_id] == n
        assert math.isclose(nll, t_nll, rel_tol=1e-9), (
            doc_id,
            nll,
            t_nll,
        )
        assert math.isclose(ppl, t_ppl, rel_tol=1e-9), (
            doc_id,
            ppl,
            t_ppl,
        )
        checked += 1
    assert checked > 0


def test_lm_nll_nano_matches_float_path(spark, sf_dir):
    """The nano-nat integer path (the registered query's operator) vs
    the float API on the SAME md5-bucketed LM: nll_nano/1e9 must track
    the float nll within the summed quantization error (0.5e-9 per
    bigram) plus float slack — the wiring proof that the fixture's
    quantized logs really are the logs of the float path's counts."""
    from data_engineering_spark.operators.lm import (
        lm_nll_nano,
        lm_perplexity,
        train_bigram_lm,
    )
    from data_engineering_spark.queries import _fixtures as FX

    B = 8192
    d = load_table(spark, sf_dir, "documents")
    lm = train_bigram_lm(
        d.filter(F.col("lang") == "en"), num_buckets=B,
        bucket_hash="md5",
    )
    lm_q = spark.createDataFrame(
        [
            (r["bucket"], FX.lm_nano(r["c"] + 1.0),
             FX.lm_nano(r["c"] + float(B)))
            for r in lm.collect()
        ],
        "bucket long, q12 long, q1 long",
    )
    nano = {
        r["doc_id"]: (r["n_bigrams"], r["nll_nano"])
        for r in lm_nll_nano(
            d, lm_q, q1_floor=FX.lm_q1_floor(B), num_buckets=B,
            bucket_hash="md5",
        ).collect()
    }
    flt = {
        r["doc_id"]: (r["n_bigrams"], r["nll"])
        for r in lm_perplexity(
            d, lm, num_buckets=B, bucket_hash="md5"
        ).collect()
    }
    assert set(nano) == set(flt)
    checked = 0
    for doc_id, (n, nllq) in nano.items():
        fn, fnll = flt[doc_id]
        assert fn == n, doc_id
        if n == 0:
            assert nllq == 0 and fnll is None
            continue
        tol = n * 1e-9  # 0.5e-9 quantization + float slack per term
        assert abs(nllq / 1e9 - fnll) <= tol, (doc_id, nllq, fnll)
        checked += 1
    assert checked > 0
