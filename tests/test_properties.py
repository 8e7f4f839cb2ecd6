"""Property tests (SURVEY.md §5): last-write-wins order-invariance and
merge idempotency, plus operator-level checks (LSH recall vs the exact
join, language-ID accuracy)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.dedup import dedup_exact, keep_last
from data_engineering_spark.operators.merge import merge_frames
from data_engineering_spark.operators.similarity import (
    cosine_similarity_join,
    lsh_bucketed_similarity_join,
)

SF = "/root/testdata/sf0.001"


def test_keep_last_permutation_invariant(spark):
    """Final LWW state depends only on max (__ts_ms, id) per key — not on
    input order (the pandas keep='last' the reference uses is positional;
    ours must be total-order deterministic)."""
    rng = random.Random(42)
    events = [
        (k, ts, rng.randint(0, 10_000))
        for k in range(20)
        for ts in rng.sample(range(100), 10)
    ]
    expected = None
    for _ in range(3):
        rng.shuffle(events)
        df = spark.createDataFrame(events, ["k", "ts", "v"]).repartition(7)
        got = sorted(
            (r["k"], r["ts"], r["v"])
            for r in keep_last(df, ["k"], "ts", tiebreakers=["v"]).collect()
        )
        if expected is None:
            expected = got
        assert got == expected


def test_merge_idempotent(spark):
    target = spark.createDataFrame(
        [(i, f"v{i}", 100, "c") for i in range(50)],
        ["id", "val", "__ts_ms", "__op"],
    )
    batch = spark.createDataFrame(
        [(i, f"u{i}", 200, "u") for i in range(0, 30)]
        + [(i, None, 200, "d") for i in range(30, 40)]
        + [(i, f"n{i}", 200, "c") for i in range(50, 60)],
        ["id", "val", "__ts_ms", "__op"],
    )
    once = merge_frames(target, batch, ["id"])
    twice = merge_frames(once, batch, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "x")], ["id", "t"]
    )
    out = {r["t"]: (r["id"], r["n_copies"])
           for r in dedup_exact(df, ["t"], "id").collect()}
    assert out == {"x": (1, 3), "y": (3, 1)}


def test_dedup_incremental_is_idempotent(spark):
    """Batch survivors vanish on re-ingest once their fingerprints are
    folded into the store; NULL and '' contents are distinct."""
    from data_engineering_spark.operators.dedup import (
        dedup_incremental,
        fingerprint_store,
    )

    corpus = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], ["id", "t"]
    )
    batch = spark.createDataFrame(
        [(10, "a"), (11, "c"), (12, "c"), (13, ""), (14, None)],
        ["id", "t"],
    )
    seen = fingerprint_store(corpus, ["t"])
    out = dedup_incremental(batch, seen, ["t"], "id")
    got = sorted((r["id"], r["t"]) for r in out.collect())
    # 10 dup of corpus 'a'; 12 in-batch dup of 11; 14 dup of corpus NULL
    assert got == [(11, "c"), (13, "")]
    # fold survivors in → re-running the same batch yields nothing
    seen2 = seen.union(fingerprint_store(out, ["t"])).distinct()
    again = dedup_incremental(batch, seen2, ["t"], "id")
    assert again.count() == 0


def test_lsh_join_recall(spark):
    """LSH blocking is approximate; at 8 hyperplanes over 64-dim data it
    must still find most exact pairs and introduce none below threshold."""
    emb = load_table(spark, SF, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_similarity_join(emb, 0.45).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in lsh_bucketed_similarity_join(emb, 0.45).collect()
    }
    assert approx <= exact  # no false positives (exact verify inside)
    if exact:
        assert len(approx) / len(exact) >= 0.7


def test_quantize_embeddings_error_bound(spark):
    """int8 codes reconstruct each component within scale/(2*127) (half
    a quantization step), codes stay in [-127, 127], zero vectors are
    all-zero with scale 0."""
    from data_engineering_spark.operators.similarity import (
        quantize_embeddings,
    )

    emb = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .limit(50)
    )
    zero = spark.createDataFrame(
        [(999999, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    out = quantize_embeddings(emb.unionByName(zero)).collect()
    src = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    src[999999] = [0.0] * 64
    for r in out:
        v, scale, q = src[r["vec_id"]], r["scale"], r["q"]
        assert all(-127 <= c <= 127 for c in q)
        if scale == 0:
            assert all(c == 0 for c in q)
            continue
        step = scale / 127
        for x, c in zip(v, q):
            assert abs(c * step - float(x)) <= step / 2 + 1e-9


def test_semdedup_pairs_subset_of_exact(spark):
    """SemDeDup scores only within coarse buckets: its pairs must be a
    subset of the exact join's (identical cosines where present), with
    both endpoints in the same bucket by construction."""
    from data_engineering_spark.operators.similarity import semdedup_pairs

    emb = load_table(spark, SF, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_r"]
        for r in cosine_similarity_join(emb, 0.45).collect()
    }
    sem = {
        (r["id_a"], r["id_b"]): r["cosine_r"]
        for r in semdedup_pairs(
            emb, (0, 5, 11, 17, 23, 31, 37, 43), 0.45
        ).collect()
    }
    assert set(sem) <= set(exact)
    for pair, cos in sem.items():
        assert cos == exact[pair], pair


def test_language_guess_on_real_sentences(spark):
    """The driver's synthetic documents share one vocabulary across all
    `lang` labels (verified: no label-distinctive words exist), so
    accuracy-vs-label is not measurable there. Assert the heuristic on
    real sentences instead, plus the 'und' fallback."""
    from data_engineering_spark.operators.text import guess_language

    rows = [
        ("the quick brown fox jumps over the lazy dog and runs to the barn", "en"),
        ("el perro corre por la calle y la casa es de madera", "es"),
        ("der hund läuft durch die strasse und das haus ist aus holz", "de"),
        ("le chien court dans la rue et le chat dort", "fr"),
        ("zzz qqq xxx yyy", "und"),
    ]
    df = spark.createDataFrame(rows, ["text", "expected"])
    got = df.select("expected", guess_language("text").alias("g")).collect()
    for r in got:
        assert r["g"] == r["expected"], r


def test_centroid_math(spark):
    """Centroid query math on a known fixture: mean per (label, dim)."""
    from data_engineering_spark.queries import QUERIES
    import os, tempfile

    d = tempfile.mkdtemp(prefix="centroid-fix-")
    spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0), (3, [10.0, 20.0], 1)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    out = {
        (r["label"], r["dim"]): (r["mean_v"], r["n_vectors"])
        for r in QUERIES["q_embedding_centroids"](spark, d).collect()
    }
    assert out == {
        (0, 0): (2.0, 2), (0, 1): (3.0, 2),
        (1, 0): (10.0, 1), (1, 1): (20.0, 1),
    }


def test_ivf_topk_recall(spark):
    """IVF probing 8/16 clusters must recover most exact neighbors and
    must never invent a better-than-exact neighbor."""
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )
    from pyspark.sql import functions as F

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(e, q, k=5).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.5


def test_ivf_distributed_assignment_matches_driver_path(
    spark, monkeypatch
):
    """Above driver_assign_limit, query→cluster assignment runs
    executor-side (mapInPandas over the query frame). The two paths must
    produce identical results — and the distributed one must never
    materialize the query side on the driver (toPandas is banned for the
    duration of the call)."""
    import pyspark.sql
    from pyspark.sql import functions as F

    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.similarity import ivf_topk

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    want = sorted(
        map(tuple, ivf_topk(e, q, k=5).collect())
    )

    def boom(self, *a, **k):
        raise AssertionError(
            "driver-side toPandas on the distributed assignment path"
        )

    monkeypatch.setattr(pyspark.sql.DataFrame, "toPandas", boom)
    # driver_assign_limit=0 forces every query through the distributed path
    got_df = ivf_topk(e, q, k=5, driver_assign_limit=0)
    got = sorted(map(tuple, got_df.collect()))
    monkeypatch.undo()
    assert got == want


def test_ivf_topk_sq8_tracks_float_path(spark):
    """int8-quantized probe scoring (IVF-SQ8) must agree with the float
    IVF path on nearly all neighbors (same probes, 127-level codes) and
    its cosines must stay within quantization error of the float ones."""
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.similarity import ivf_topk
    from pyspark.sql import functions as F

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    fl = {
        (r["query_id"], r["neighbor_id"]): r["cosine_r"]
        for r in ivf_topk(e, q, k=5).collect()
    }
    q8 = {
        (r["query_id"], r["neighbor_id"]): r["cosine_r"]
        for r in ivf_topk(e, q, k=5, quantized=True).collect()
    }
    overlap = set(fl) & set(q8)
    assert len(overlap) / len(fl) >= 0.8, (len(overlap), len(fl))
    for key in overlap:
        assert abs(fl[key] - q8[key]) < 0.02, (key, fl[key], q8[key])


def test_ivf_index_parquet_roundtrip_matches_direct(spark, tmp_path):
    """Index-persistence contract: build_ivf_index written to parquet
    and read back must serve identical results to the one-shot
    ivf_topk (both float and SQ8 variants) — the corpus is clustered
    once, not per query batch."""
    from pyspark.sql import functions as F

    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_from_index,
    )

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    for quantized in (False, True):
        want = sorted(
            map(tuple, ivf_topk(e, q, k=5, quantized=quantized).collect())
        )
        cents, assigned = build_ivf_index(e, quantized=quantized)
        cdir = str(tmp_path / f"cent_{quantized}")
        adir = str(tmp_path / f"assign_{quantized}")
        cents.write.parquet(cdir)
        assigned.write.partitionBy("__cluster").parquet(adir)
        got = sorted(
            map(
                tuple,
                ivf_topk_from_index(
                    spark.read.parquet(cdir),
                    spark.read.parquet(adir),
                    q,
                    k=5,
                ).collect(),
            )
        )
        assert got == want, f"quantized={quantized}"


def test_lsh_params_planner():
    """Planner returns the most selective banding clearing the recall
    bar; the closed-form recall at the threshold must actually clear
    it, and one more plane per band must not fit within the band cap
    (maximality)."""
    import math

    from data_engineering_spark.operators.similarity import lsh_params_for

    for threshold, recall in [
        (0.9, 0.9), (0.8, 0.9), (0.6, 0.9), (0.45, 0.9),
        (0.9, 0.99), (0.5, 0.8),
    ]:
        b, r = lsh_params_for(threshold, recall)
        p = 1.0 - math.acos(threshold) / math.pi
        achieved = 1.0 - (1.0 - p**r) ** b
        assert achieved >= recall, (threshold, recall, b, r, achieved)
        # maximality: r+1 planes would need more than max_bands bands
        if r < 24:
            need = math.ceil(
                math.log(1.0 - recall) / math.log(1.0 - p ** (r + 1))
            )
            assert need > 64, (threshold, recall, r, need)

    # detection is monotone above the threshold: a pair at a higher
    # cosine is detected at least as often
    b, r = lsh_params_for(0.6, 0.9)
    det = [
        1.0 - (1.0 - (1.0 - math.acos(c) / math.pi) ** r) ** b
        for c in (0.6, 0.7, 0.8, 0.9)
    ]
    assert det == sorted(det)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        # near-orthogonal threshold + tight recall + few bands: no
        # banding works — the exact-join regime
        lsh_params_for(0.01, 0.999, max_bands=8)
    with _pytest.raises(ValueError):
        lsh_params_for(1.5, 0.9)


def test_embedding_incremental_pairs_equivalence(spark):
    """Incremental (batch-vs-index + within-batch) pairs plus the
    corpus-internal pairs must partition EXACTLY the full batch join's
    output: banding is per-vector, so candidate buckets don't depend
    on which side a vector arrived with."""
    from data_engineering_spark.operators.similarity import (
        embedding_incremental_pairs,
        embedding_lsh_index,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    new = emb.filter(F.col("vec_id") % 5 == 0)
    old = emb.filter(F.col("vec_id") % 5 != 0)
    kw = dict(num_bands=16, planes_per_band=5)
    t = 0.4

    full = {
        (r["id_a"], r["id_b"])
        for r in lsh_bucketed_similarity_join(emb, t, **kw).collect()
    }
    idx = embedding_lsh_index(old, **kw)
    inc = {
        (r["id_a"], r["id_b"])
        for r in embedding_incremental_pairs(new, idx, t, **kw).collect()
    }
    old_only = {
        (r["id_a"], r["id_b"])
        for r in lsh_bucketed_similarity_join(old, t, **kw).collect()
    }
    assert inc | old_only == full
    assert inc & old_only == set()
    assert full, "fixture corpus must produce pairs at this threshold"
    # every incremental pair involves at least one new id
    assert all(a % 5 == 0 or b % 5 == 0 for a, b in inc)


def test_embedding_lsh_index_parquet_roundtrip(spark, tmp_path):
    """The serve-many flow: index written partitioned by band, read
    back from disk, probed — identical pairs to the in-memory index
    (schema and bucket assignment survive the round-trip; the band
    partition column comes back as int)."""
    from data_engineering_spark.operators.similarity import (
        embedding_incremental_pairs,
        embedding_lsh_index,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    new = emb.filter(F.col("vec_id") % 5 == 0)
    old = emb.filter(F.col("vec_id") % 5 != 0)
    kw = dict(num_bands=16, planes_per_band=5)

    idx = embedding_lsh_index(old, **kw)
    path = str(tmp_path / "lsh_index")
    idx.write.partitionBy("band").parquet(path)
    stored = spark.read.parquet(path).withColumn(
        "band", F.col("band").cast("int")
    )

    mem = {
        tuple(r)
        for r in embedding_incremental_pairs(new, idx, 0.4, **kw).collect()
    }
    disk = {
        tuple(r)
        for r in embedding_incremental_pairs(
            new, stored, 0.4, **kw
        ).collect()
    }
    assert mem == disk and mem


def test_lsh_join_tiled_equals_untiled(spark):
    """Triangle tiling for over-cap buckets must not change results —
    every unordered pair meets in exactly one tile. Fixture forces the
    skew: many near-identical vectors co-bucket everywhere."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = []
    for i in range(60):  # one fat clique
        rows.append((i, (base + 0.01 * rng.standard_normal(16)).tolist()))
    for i in range(60, 90):  # background
        rows.append((i, rng.standard_normal(16).tolist()))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    kw = dict(num_bands=4, planes_per_band=3)
    plain = {
        tuple(r)
        for r in lsh_bucketed_similarity_join(df, 0.5, **kw).collect()
    }
    tiled = {
        tuple(r)
        for r in lsh_bucketed_similarity_join(
            df, 0.5, max_bucket_rows=8, **kw
        ).collect()
    }
    assert plain == tiled and len(plain) >= 60 * 59 / 2


def test_tiled_release_cache_same_results_and_no_leak(spark):
    """release_cache=True must not change results, and the tiled
    banding persist must actually be dropped (streaming callers invoke
    this per batch — a leaked block per call is unbounded state)."""
    emb = load_table(spark, SF, "embeddings")
    kw = dict(num_bands=8, planes_per_band=4, max_bucket_rows=64)
    kept = {
        tuple(r)
        for r in lsh_bucketed_similarity_join(emb, 0.4, **kw).collect()
    }
    spark.catalog.clearCache()
    # earlier tests' localCheckpoint blocks are freed ASYNCHRONOUSLY
    # by the ContextCleaner once their python refs are gone — settle
    # toward an empty store instead of asserting the shared session is
    # instantaneously clean (the 12cfc08 deflake contract), and assert
    # the LEAK as a delta against whatever baseline remains
    import gc
    import time as _t

    def _ids():
        return {
            int(i.id())
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    baseline_ids = _ids()
    for _ in range(60):
        if not baseline_ids:
            break
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        _t.sleep(0.5)
        baseline_ids = _ids()
    released = {
        tuple(r)
        for r in lsh_bucketed_similarity_join(
            emb, 0.4, release_cache=True, **kw
        ).collect()
    }
    assert kept == released and kept
    # Compare by RDD id, not count: a baseline block freed between the
    # two measurements must not mask a genuinely-leaked new block.
    # Exactly one NEW id may remain — the output-sized localCheckpoint
    # of the result (eager_checkpoint's contract); the banding persist
    # (the big one, id + vector per band row) must be gone.
    new_ids = _ids() - baseline_ids
    assert len(new_ids) <= 1, f"banding persist leaked: {new_ids}"


def test_incremental_tiled_equals_untiled(spark):
    """Same invariance for the mixed-mode (batch-vs-index) scorer."""
    from data_engineering_spark.operators.similarity import (
        embedding_incremental_pairs,
        embedding_lsh_index,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    new = emb.filter(F.col("vec_id") % 5 == 0)
    old = emb.filter(F.col("vec_id") % 5 != 0)
    kw = dict(num_bands=16, planes_per_band=5)
    idx = embedding_lsh_index(old, **kw)
    plain = {
        tuple(r)
        for r in embedding_incremental_pairs(new, idx, 0.4, **kw).collect()
    }
    tiled = {
        tuple(r)
        for r in embedding_incremental_pairs(
            new, idx, 0.4, max_bucket_rows=16, **kw
        ).collect()
    }
    assert plain == tiled and plain
