"""Distributed PCA for embedding columns.

The standard dimensionality-reduction step before ANN indexing or
whitening (and the rotation inside OPQ/IVF-OPQ pipelines): project
d-dim embeddings onto their top-k principal components.

Scale shape — the only thing that grows with the corpus is ONE pass
computing per-batch Gram partials:

1. `mapInPandas` emits, per Arrow batch, the flattened d×d Gram matrix
   X'X, the column sum, and the row count — numpy BLAS work that
   built-in functions can't express (same rationale as the GEMM
   similarity join). Each batch contributes d² + d + 1 numbers no
   matter how many rows it holds.
2. The partials reduce JVM-side: posexplode to (idx, val) and one
   shuffle-sum of d²+d+1 keys.
3. The driver assembles the d×d covariance (constant-size: 64×64 here)
   and runs `numpy.linalg.eigh` — metadata-scale math, like the IVF
   centroid handling.
4. Projection is a pure codegen expression: k dot products against
   literal component vectors (`dot_flat`), no Python in the scoring
   pass.

Eigenvectors are sign-normalized (largest-|coefficient| entry made
positive) so the fit is deterministic run-to-run.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_spark.operators.similarity import (
    as_double_vec,
    vector_dim,
)


@dataclass(frozen=True)
class PCAModel:
    mean: tuple[float, ...]          # d
    components: tuple[tuple[float, ...], ...]  # k × d, rows orthonormal
    explained_variance: tuple[float, ...]      # k, descending
    n_rows: int = 0                  # corpus size the model was fit on


def pca_fit(vectors: DataFrame, vec_col: str, k: int) -> PCAModel:
    """One-pass covariance: E[xx'] - mean·mean' from distributed Gram
    partials; eigendecomposition on the driver (d×d is constant-size).
    """
    d = vector_dim(vectors, vec_col)
    if d is None:
        raise ValueError("empty vector frame")
    if not 1 <= k <= d:
        raise ValueError(f"k={k} out of range 1..{d}")

    def gram_partials(batches):
        import pandas as pd

        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            )
            if len(x) == 0:
                continue
            flat = np.concatenate(
                [(x.T @ x).ravel(), x.sum(axis=0), [float(len(x))]]
            )
            yield pd.DataFrame({"partial": [flat.tolist()]})

    # NULL vectors would make the per-batch numpy array ragged and
    # crash the task with an inhomogeneous-shape error — drop them
    # (a NULL embedding carries no signal for the fit)
    partials = (
        vectors.filter(F.col(vec_col).isNotNull())
        .select(as_double_vec(vec_col).alias("__v"))
        .mapInPandas(gram_partials, "partial array<double>")
    )
    summed = (
        partials.select(F.posexplode("partial").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum("val").alias("val"))
        .collect()  # exactly d*d + d + 1 rows — constant in corpus size
    )
    vec = np.zeros(d * d + d + 1)
    for r in summed:
        vec[r["idx"]] = r["val"]
    gram, s, n = vec[: d * d].reshape(d, d), vec[d * d : -1], vec[-1]
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps, var = evecs[:, order].T, evals[order]
    # deterministic sign: make each component's largest-|coeff| positive
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=tuple(float(v) for v in mean),
        components=tuple(tuple(float(v) for v in row) for row in comps),
        explained_variance=tuple(float(v) for v in var),
        n_rows=int(n),
    )


def pca_project(
    vectors: DataFrame,
    vec_col: str,
    model: PCAModel,
    out_col: str = "pca",
) -> DataFrame:
    """Append `out_col` = [(x-mean)·c_1, …, (x-mean)·c_k]. The mean
    shift folds into a per-component constant, so each output element
    is one literal-weighted dot product — straight-line codegen, no
    Python, no shuffle."""
    d = len(model.mean)
    projs = []
    for comp in model.components:
        # (x - m)·c = x·c - m·c ; precompute the scalar offset
        offset = float(np.dot(model.mean, comp))
        total = F.lit(-offset)
        for i in range(d):
            if comp[i] != 0.0:
                total = total + F.element_at(F.col("__pv"), i + 1) * F.lit(
                    comp[i]
                )
        projs.append(total)
    return (
        vectors.withColumn("__pv", as_double_vec(vec_col))
        .withColumn(out_col, F.array(*projs))
        .drop("__pv")
    )


@dataclass(frozen=True)
class LinearModel:
    coefficients: tuple[float, ...]  # per feature
    intercept: float
    n_rows: int


def linear_regression_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    l2: float = 0.0,
) -> LinearModel:
    """Exact multi-feature linear regression (optionally ridge) by
    NORMAL EQUATIONS over distributed sufficient statistics: one pass
    accumulates the (k+2)x(k+2) Gram of [features, 1, label] — the same
    Arrow-batched partial-reduction as `pca_fit` — and the driver
    solves the (k+1)-dim system. Sufficient statistics are the whole
    point at 100 TB: the model fits from k² numbers no matter the row
    count, and partials merge associatively across partitions/days.
    The intercept rides as the constant pseudo-feature; `l2` adds ridge
    regularization to the feature block only (standard: the intercept
    is never penalized)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    k = len(feature_cols)
    if k == 0:
        raise ValueError("need at least one feature")
    vec = F.array(
        *[F.col(c).cast("double") for c in feature_cols],
        F.lit(1.0),
        F.col(label_col).cast("double"),
    )
    # one NULL feature or label becomes NaN in numpy and poisons the
    # summed Gram — the fit would return all-NaN coefficients with no
    # error. Standard OLS practice: complete-case rows only.
    nonnull = F.col(label_col).isNotNull()
    for c in feature_cols:
        nonnull = nonnull & F.col(c).isNotNull()
    aug = df.filter(nonnull).select(vec.alias("__v"))

    def gram_partials(batches):
        import pandas as pd

        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            )
            if len(x) == 0:
                continue
            yield pd.DataFrame(
                {"partial": [
                    np.concatenate(
                        [(x.T @ x).ravel(), [float(len(x))]]
                    ).tolist()
                ]}
            )

    d = k + 2
    summed = (
        aug.mapInPandas(gram_partials, "partial array<double>")
        .select(F.posexplode("partial").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    flat = np.zeros(d * d + 1)
    for r in summed:
        flat[r["idx"]] = r["val"]
    gram, n = flat[:-1].reshape(d, d), int(flat[-1])
    a = gram[: k + 1, : k + 1].copy()
    b = gram[: k + 1, k + 1]
    if l2:
        a[np.arange(k), np.arange(k)] += l2  # features only
    w = np.linalg.solve(a, b)
    return LinearModel(
        coefficients=tuple(float(v) for v in w[:k]),
        intercept=float(w[k]),
        n_rows=n,
    )
