"""Graph-analytics operator semantics: degrees, triangles, PageRank
(operators/graph.py additions)."""

from __future__ import annotations

import numpy as np
import pytest

from data_engineering_spark.operators.graph import (
    degrees,
    pagerank,
    triangle_count,
)


def _edges(spark, pairs, schema="doc_a long, doc_b long"):
    return spark.createDataFrame(pairs, schema)


def test_degrees(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    got = {r.vertex: r.degree for r in degrees(e).collect()}
    assert got == {1: 2, 2: 2, 3: 3, 4: 1}


def test_triangle_count_basic(spark):
    # K4 has 4 triangles; the pendant edge (4,5) adds none
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = _edges(spark, k4 + [(3, 4)])
    assert triangle_count(e).collect()[0].n_triangles == 4


def test_triangle_count_orientation_and_dups(spark):
    # duplicate + reversed + self-loop edges must not change the count
    e = _edges(
        spark,
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (1, 1)],
    )
    assert triangle_count(e).collect()[0].n_triangles == 1


@pytest.mark.parametrize("damping", [0.85, 0.5])
def test_pagerank_matches_numpy(spark, damping):
    edges = [(0, 1, 1.0), (0, 2, 3.0), (1, 2, 1.0), (2, 0, 1.0), (3, 0, 2.0)]
    # vertex 4 intentionally absent: only vertices touching edges rank
    e = _edges(spark, edges, "src long, dst long, w double")
    got = {
        r.vertex: r.rank
        for r in pagerank(
            e, "src", "dst", weight_col="w", damping=damping, n_iter=12
        ).collect()
    }
    n = 4
    P = np.zeros((n, n))
    for s, d, w in edges:
        P[s, d] = w
    P = P / P.sum(axis=1, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        flowed = r @ P
        residual = (1.0 - damping * flowed.sum()) / n
        r = damping * flowed + residual
    assert got.keys() == set(range(n))
    for v in range(n):
        assert got[v] == pytest.approx(r[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_mass(spark):
    # vertex 2 is a sink (appears only as dst): its mass must be
    # teleported back, ranks still summing to 1
    e = _edges(spark, [(0, 2, 1.0), (1, 2, 1.0)], "src long, dst long, w double")
    got = pagerank(e, "src", "dst", weight_col="w", n_iter=8).collect()
    assert sum(r.rank for r in got) == pytest.approx(1.0, abs=1e-9)
    ranks = {r.vertex: r.rank for r in got}
    assert ranks[2] > ranks[0] == ranks[1]
