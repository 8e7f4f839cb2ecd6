"""Tests: LSH star-edge cluster assignment (minhash_star_clusters) —
the linear-edge-output near-dup path for duplicate-heavy corpora.

The structural fixture builds the three shapes that distinguish star
semantics from full-pairs semantics:
- a CLIQUE (several copies of one text with tiny tail edits) — where
  the pair operators emit O(m^2) rows and the star emits m-1;
- a CHAIN (A~B, B~C, A!~C via sliding word windows) — where star
  connectivity must still find the full {A,B,C} component through the
  middle vertex;
- SINGLETONS — which must come back as their own cluster.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.graph import connected_components
from data_engineering_spark.operators.minhash import (
    _shingle_sets_and_bands,
    minhash_near_dup_pairs,
    minhash_star_clusters,
    star_edges,
)

WORDS = [f"w{i:03d}" for i in range(200)]


def _doc(lo: int, hi: int) -> str:
    return " ".join(WORDS[lo:hi])


def _fixture(spark):
    rows = [
        # clique: 4 near-identical docs (one word appended per copy)
        (1, _doc(0, 60)),
        (2, _doc(0, 60) + " extraA"),
        (3, _doc(0, 60) + " extraB"),
        (4, _doc(0, 60) + " extraA extraB"),
        # chain via 12-word window shifts: adjacent docs share 48/60
        # words (trigram jaccard ~0.66 >= 0.6), the ends share only 36
        # (jaccard ~0.41 < 0.6) — linked only through the middle
        (10, _doc(100, 160)),
        (11, _doc(112, 172)),
        (12, _doc(124, 184)),
        # singletons (disjoint vocabulary ranges, reversed for safety)
        (20, " ".join(reversed(WORDS[0:40]))),
        (21, " ".join(reversed(WORDS[60:100]))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _full_pair_clusters(spark, docs, threshold):
    """Reference: components of the FULL verified pair graph, with
    singletons coalesced to themselves — exact transitive closure."""
    pairs = minhash_near_dup_pairs(docs, threshold=threshold)
    comp = connected_components(pairs, "doc_a", "doc_b")
    return {
        r["doc_id"]: r["cluster_id"]
        for r in docs.select("doc_id")
        .join(
            comp.select(
                F.col("vertex").alias("doc_id"),
                F.col("component").alias("cluster_id"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .collect()
    }


def test_star_matches_full_pair_components(spark):
    docs = _fixture(spark)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in minhash_star_clusters(docs, threshold=0.6).collect()
    }
    want = _full_pair_clusters(spark, docs, 0.6)
    assert got == want
    # and the shapes are what the fixture intends
    assert got[1] == got[2] == got[3] == got[4] == 1
    assert got[10] == got[11] == got[12] == 10  # chain linked via 11
    assert got[20] == 20 and got[21] == 21


def test_chain_endpoints_not_direct_pairs(spark):
    """Precondition of the chain shape: the endpoints are NOT a direct
    pair (otherwise the chain test proves nothing)."""
    docs = _fixture(spark).filter(F.col("doc_id").isin(10, 12))
    assert minhash_near_dup_pairs(docs, threshold=0.6).count() == 0


def test_star_edges_linear_in_clique_size(spark):
    """A 12-member clique: full pair emission is C(12,2)=66 rows; star
    edges collapse to exactly 11 (every band bucket has the same
    membership, dedup leaves rep->member once per member)."""
    m = 12
    rows = [(i, _doc(0, 80) + f" tail{i}") for i in range(m)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docsets, bands = _shingle_sets_and_bands(
        docs, "doc_id", "text", 3, 64, 32
    )
    edges = star_edges(bands)
    assert edges.count() == m - 1
    assert (
        minhash_near_dup_pairs(docs, threshold=0.6).count()
        == m * (m - 1) // 2
    )
    docsets.unpersist()


def test_unverified_star_equals_bucket_graph_components(spark):
    """verify=False semantics: components over star edges must equal
    components over the full bucket-clique candidate graph."""
    docs = _fixture(spark)
    docsets, bands = _shingle_sets_and_bands(
        docs, "doc_id", "text", 3, 64, 32
    )
    a = bands.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b = bands.select(F.col("doc").alias("doc_b"), "band", "bucket")
    clique_pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    want_comp = {
        r["vertex"]: r["component"]
        for r in connected_components(
            clique_pairs, "doc_a", "doc_b"
        ).collect()
    }
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in minhash_star_clusters(
            docs, threshold=0.6, verify=False
        ).collect()
    }
    for v, c in want_comp.items():
        assert got[v] == c
    docsets.unpersist()


def test_every_doc_assigned_exactly_once(spark):
    docs = _fixture(spark)
    out = minhash_star_clusters(docs, threshold=0.6)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # cluster ids are component minima: every cluster id is a doc id
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert all(
        r["cluster_id"] in ids for r in out.select("cluster_id").collect()
    )
