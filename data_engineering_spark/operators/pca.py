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

    partials = vectors.select(
        as_double_vec(vec_col).alias("__v")
    ).mapInPandas(gram_partials, "partial array<double>")
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
