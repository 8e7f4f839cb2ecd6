"""Tests: corpus-hygiene filters (operators/filters.py) and
connected-components dedup clustering (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.operators.filters import (
    gopher_metrics,
    repetition_metrics,
    scrub_pii,
    split_assign,
)
from data_engineering_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def test_gopher_metrics_known_doc(spark):
    good = " ".join(["alpha beta gamma delta"] * 20)  # 80 tokens, alpha
    short = "too short"
    symbols = " ".join(["### !!! $$$"] * 30)  # 90 tokens, no alpha
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in gopher_metrics(df).collect()}
    assert out[1]["n_tokens"] == 80 and out[1]["keep"]
    assert out[1]["frac_alpha"] == 1.0
    assert out[2]["n_tokens"] == 2 and not out[2]["keep"]
    assert out[3]["n_alpha_tokens"] == 0 and not out[3]["keep"]
    assert out[3]["frac_alpha"] == 0.0


def test_repetition_metrics(spark):
    rep = " ".join(["spam ham eggs"] * 10)  # 30 tokens, heavy repeats
    uniq = " ".join(f"w{i}" for i in range(30))
    tiny = "a b"  # shorter than n
    df = spark.createDataFrame(
        [(1, rep), (2, uniq), (3, tiny)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in repetition_metrics(df, n=3).collect()}
    assert out[1]["n_grams"] == 28
    assert out[1]["n_distinct"] == 3  # the 3 rotations of the motif
    assert out[1]["rep_ratio"] == pytest.approx(1 - 3 / 28)
    assert out[2]["rep_ratio"] == 0.0 and out[2]["n_distinct"] == 28
    assert out[3]["n_grams"] == 0 and out[3]["rep_ratio"] == 0.0


def test_scrub_pii(spark):
    text = (
        "mail bob@corp.example.org or alice.smith@x.io, "
        "see https://a.example.com/page?q=1 then call 555-123-4567 done"
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = scrub_pii(df).collect()[0]
    assert r["n_emails"] == 2 and r["n_urls"] == 1 and r["n_phones"] == 1
    assert "<EMAIL>" in r["clean_text"] and "<URL>" in r["clean_text"]
    assert "<PHONE>" in r["clean_text"]
    assert "bob@" not in r["clean_text"] and "555-123" not in r["clean_text"]


def test_split_assign_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], ["doc_id"])
    out = split_assign(df, "doc_id")
    rows = {r["doc_id"]: (r["bucket"], r["split"]) for r in out.collect()}
    again = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in split_assign(df, "doc_id").collect()
    }
    assert rows == again  # pure function of (id, salt)
    splits = [s for _, s in rows.values()]
    n = len(splits)
    # 98/1/1 within generous tolerance at n=5000
    assert 0.95 < splits.count("train") / n < 0.99
    assert 0.003 < splits.count("val") / n < 0.03
    assert 0.003 < splits.count("test") / n < 0.03
    # a different salt reshuffles assignments
    other = split_assign(df, "doc_id", salt="other")
    moved = (
        out.alias("a")
        .join(other.alias("b"), "doc_id")
        .filter(F.col("a.split") != F.col("b.split"))
        .count()
    )
    assert moved > 0


def test_connected_components_known_graph(spark):
    # component {1,2,3,4} as a path (needs >1 round), {10,11}, isolated
    # vertices don't appear
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
    )
    cc = {
        r["vertex"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path(spark):
    # a 40-vertex path exercises multi-round label propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["doc_a", "doc_b"]
    )
    cc = connected_components(edges)
    comps = {r["component"] for r in cc.collect()}
    assert comps == {0}
    assert cc.count() == 41


def test_dedup_clusters_shape(spark):
    edges = spark.createDataFrame(
        [(5, 9), (9, 7), (20, 30)], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: r for r in dedup_clusters(edges).collect()}
    assert out[5]["cluster_id"] == 5 and out[5]["is_canonical"]
    assert out[9]["cluster_id"] == 5 and not out[9]["is_canonical"]
    assert out[7]["cluster_size"] == 3
    assert out[20]["is_canonical"] and out[30]["cluster_size"] == 2
    # exactly one canonical doc per cluster
    canon = [r for r in out.values() if r["is_canonical"]]
    assert len(canon) == 2


def test_connected_components_edges_unique_fast_path(spark):
    # the unique-canonical fast path (skips the union+distinct
    # shuffle) must label identically to the default path — including
    # when the caller MIS-declares uniqueness: duplicate / reversed
    # edges never change min-label CC output, only loop size
    uniq = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
    )
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(
            uniq, edges_unique=True
        ).collect()
    }
    assert got == expect
    messy = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (2, 3), (4, 3), (10, 11), (11, 10)],
        ["doc_a", "doc_b"],
    )
    got_messy = {
        r["vertex"]: r["component"]
        for r in connected_components(
            messy, edges_unique=True
        ).collect()
    }
    assert got_messy == expect


def test_dedup_clusters_edges_unique_matches_default(spark):
    edges = spark.createDataFrame(
        [(5, 9), (9, 7), (20, 30)], ["doc_a", "doc_b"]
    )
    base = sorted(
        map(tuple, dedup_clusters(edges).collect())
    )
    fast = sorted(
        map(tuple, dedup_clusters(edges, edges_unique=True).collect())
    )
    assert base == fast


def test_c4_line_filter(spark):
    from data_engineering_spark.operators.filters import c4_line_filter

    doc1 = "\n".join([
        "This is a proper sentence with enough words here.",
        "short line.",                           # < 5 words
        "No terminal punctuation on this line",  # no [.!?]$
        "Please accept our cookie policy to continue browsing now.",
        "Another good line that ends with a question mark?",
        "And one more complete sentence to pass the minimum!",
    ])
    doc2 = "Lorem ipsum dolor sit amet consectetur."  # boiler + 1 line
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}

    r1 = out[1]
    assert r1["n_lines"] == 6
    # kept: line 1, question-mark line, exclamation line (cookie line
    # is boilerplate, short/unpunctuated lines fail the word/punct rules)
    assert r1["n_kept_lines"] == 3 and r1["keep"]
    assert r1["clean_text"].splitlines()[0].startswith("This is a proper")
    assert "cookie" not in r1["clean_text"]

    r2 = out[2]
    assert r2["n_kept_lines"] == 0 and not r2["keep"]
    assert r2["clean_text"] == ""


def test_water_fill_properties(spark):
    """Allocation exhausts the budget exactly when binding, never
    exceeds any demand, and is max-min fair (small demands fully met,
    big ones levelled to a common theta)."""
    from data_engineering_spark.operators.filters import water_fill

    d = spark.createDataFrame(
        [("a", 10), ("b", 50), ("c", 200), ("d", 900)], ["src", "dem"]
    )
    # binding budget: 10 + 50 funded; theta = (300-60)/2 = 120
    out = {r["src"]: r["alloc"] for r in
           water_fill(d, "src", "dem", budget=300).collect()}
    assert out == {"a": 10.0, "b": 50.0, "c": 120.0, "d": 120.0}
    assert abs(sum(out.values()) - 300) < 1e-9
    # loose budget: everyone gets their demand
    out2 = {r["src"]: r["alloc"] for r in
            water_fill(d, "src", "dem", budget=10_000).collect()}
    assert out2 == {"a": 10.0, "b": 50.0, "c": 200.0, "d": 900.0}
    # budget below the smallest demand: equal split, nobody fully funded
    out3 = {r["src"]: r["alloc"] for r in
            water_fill(d, "src", "dem", budget=8).collect()}
    assert out3 == {"a": 2.0, "b": 2.0, "c": 2.0, "d": 2.0}
