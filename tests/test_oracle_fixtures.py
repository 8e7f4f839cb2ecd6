"""Oracle fixture machinery: the determinism contracts the
fixture-backed oracles (LSH / PCA / IVF / PQ) rest on."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as papq
import pytest

from data_engineering_spark.queries import _fixtures as FX

SF = "/root/testdata/sf0.001"


def test_stride_sample_spark_equals_pyarrow(spark):
    """THE keystone: the Spark-side training sample must be
    bit-identical to the registration-time pyarrow sample, or the
    query and its oracle would train different models depending on
    which ran first."""
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.queries.similarity import (
        _stride_sample_spark,
    )

    x_pa, n_pa = FX._stride_sample_matrix(SF)
    e = load_table(spark, SF, "embeddings")
    x_sp, n_sp = _stride_sample_spark(e)
    assert n_pa == n_sp
    assert x_pa.shape == x_sp.shape
    assert np.array_equal(x_pa, x_sp)  # bit-for-bit, not approx


def test_ivf_training_deterministic():
    x, n = FX._stride_sample_matrix(SF)
    c1 = FX.ivf_train_centroids(x)
    c2 = FX.ivf_train_centroids(x.copy())
    assert np.array_equal(c1, c2)
    assert c1.shape == (FX.IVF_CLUSTERS, x.shape[1])


def test_pq_training_deterministic_and_padded():
    x, _ = FX._stride_sample_matrix(SF)
    cb1 = FX.pq_train_sample(x)
    cb2 = FX.pq_train_sample(x.copy())
    assert np.array_equal(cb1, cb2)
    assert cb1.shape == (FX.PQ_M, FX.PQ_K_CODES, x.shape[1] // FX.PQ_M)


def test_keyed_fixture_merge_preserves_other_corpora(tmp_path):
    path = str(tmp_path / "fx.parquet")
    FX._merge_keyed_rows(path, [(100, 1, 1, 0.5), (100, 1, 2, 0.25)], 100)
    FX._merge_keyed_rows(path, [(200, 1, 1, 0.75)], 200)
    # overwrite corpus 100; corpus 200 must survive
    FX._merge_keyed_rows(path, [(100, 1, 1, 0.9)], 100)
    t = papq.read_table(path)
    rows = sorted(
        zip(*[t[c].to_pylist() for c in ("corpus_n", "j", "d", "w")])
    )
    assert rows == [(100, 1, 1, 0.9), (200, 1, 1, 0.75)]


def test_lsh_planes_fixture_matches_operator_draw():
    nb, r, dim, seed = (
        FX._LSH_BANDS,
        FX._LSH_PLANES_PER_BAND,
        FX._LSH_DIM,
        FX._LSH_SEED,
    )
    path = FX.lsh_planes_fixture()
    t = papq.read_table(path)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nb, r, dim))
    got = {}
    for b, p, d, w in zip(*[t[c].to_pylist() for c in ("band", "plane", "d", "w")]):
        got[(b, p, d)] = w
    assert got[(0, 0, 1)] == planes[0, 0, 0]
    assert got[(nb - 1, r - 1, dim)] == planes[nb - 1, r - 1, dim - 1]
    assert len(got) == nb * r * dim


def test_round9_model_idempotent():
    mean = np.array([0.123456789123, -2.5])
    comps = np.array([[0.999999999999, 1e-12]])
    m1, c1 = FX.round9_model(mean, comps)
    m2, c2 = FX.round9_model(m1, c1)
    assert np.array_equal(m1, m2) and np.array_equal(c1, c2)
    assert c1[0, 1] == 0.0  # sub-grid noise quantized away
