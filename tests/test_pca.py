"""Distributed PCA (operators/pca): correctness against numpy on the
same data, orthonormality, variance ordering, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from data_engineering_spark.operators.pca import pca_fit, pca_project


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(7)
    # anisotropic 8-dim cloud: variance concentrated in 2 directions
    base = rng.normal(size=(500, 8)) * np.array(
        [10.0, 5.0, 1, 1, 0.5, 0.5, 0.1, 0.1]
    )
    rot, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    x = base @ rot + 3.0
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(6)
    return x, df


def test_fit_matches_numpy(data):
    x, df = data
    m = pca_fit(df, "embedding", k=3)
    cov = np.cov(x, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    assert np.allclose(m.mean, x.mean(axis=0), atol=1e-9)
    assert np.allclose(m.explained_variance, evals, rtol=1e-9)
    # components span the same top-3 eigenspace as numpy's
    _, vecs = np.linalg.eigh(cov)
    top = vecs[:, np.argsort(np.linalg.eigvalsh(cov))[::-1][:3]]
    c = np.asarray(m.components)
    overlap = np.abs(c @ top)  # should be a permutation-ish orthogonal map
    assert np.allclose(np.sort(overlap.max(axis=1)), [1, 1, 1], atol=1e-6)


def test_components_orthonormal_and_ordered(data):
    _, df = data
    m = pca_fit(df, "embedding", k=4)
    c = np.asarray(m.components)
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-9)
    ev = list(m.explained_variance)
    assert ev == sorted(ev, reverse=True)
    assert all(v >= 0 for v in ev)


def test_projection_variance_and_centering(data):
    x, df = data
    m = pca_fit(df, "embedding", k=2)
    proj = np.asarray(
        [r["pca"] for r in pca_project(df, "embedding", m)
         .orderBy("vec_id").collect()]
    )
    # projected dims are centered with variance == the eigenvalues
    assert np.allclose(proj.mean(axis=0), 0, atol=1e-8)
    assert np.allclose(
        proj.var(axis=0), m.explained_variance[:2], rtol=1e-9
    )


def test_deterministic_across_partitionings(data):
    _, df = data
    m1 = pca_fit(df.repartition(2), "embedding", k=2)
    m2 = pca_fit(df.repartition(11), "embedding", k=2)
    # decimal-free float sums differ at ulp level across partitionings;
    # the MODEL must still agree to high precision and identical signs
    assert np.allclose(m1.components, m2.components, atol=1e-9)
    assert np.allclose(m1.explained_variance, m2.explained_variance)


def test_linear_regression_matches_numpy(spark):
    from data_engineering_spark.operators.pca import linear_regression_fit

    rng = np.random.default_rng(11)
    x = rng.normal(size=(800, 3))
    y = x @ np.array([2.5, -1.0, 0.25]) + 7.0 + rng.normal(
        scale=0.01, size=800
    )
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(t))
         for (a, b, c), t in zip(x, y)],
        "f1 double, f2 double, f3 double, y double",
    ).repartition(7)
    m = linear_regression_fit(df, ["f1", "f2", "f3"], "y")
    xa = np.hstack([x, np.ones((800, 1))])
    ref, *_ = np.linalg.lstsq(xa, y, rcond=None)
    assert np.allclose(m.coefficients, ref[:3], atol=1e-8)
    assert abs(m.intercept - ref[3]) < 1e-8
    assert m.n_rows == 800

    # ridge shrinks coefficients toward zero, intercept unpenalized
    r = linear_regression_fit(df, ["f1", "f2", "f3"], "y", l2=1000.0)
    assert all(
        abs(rc) < abs(c) for rc, c in zip(r.coefficients, m.coefficients)
    )
