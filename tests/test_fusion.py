"""RRF hybrid-retrieval fusion tests (operators/fusion.py)."""

from __future__ import annotations

from data_engineering_spark.operators.fusion import (
    coordination_rank,
    rrf_fuse,
)


def test_rrf_hand_checked(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        ["query_id", "doc_id", "rank"],
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        ["query_id", "doc_id", "rank"],
    )
    rows = {
        r["doc_id"]: r
        for r in rrf_fuse(a, b, k_rrf=60, topk=10).collect()
    }
    # doc 11 ranked by both: 1/62 + 1/61
    assert rows[11]["rrf_r"] == round(1 / 62 + 1 / 61, 9)
    assert rows[11]["fused_rank"] == 1
    assert rows[11]["a_rank"] == 2 and rows[11]["b_rank"] == 1
    # one-sided docs: the missing side contributes exactly 0
    assert rows[10]["rrf_r"] == round(1 / 61, 9)
    assert rows[10]["b_rank"] is None
    assert rows[13]["rrf_r"] == round(1 / 62, 9)
    assert rows[13]["a_rank"] is None
    # 1/61 (doc 10) > 1/62 (doc 13) > 1/63 (doc 12)
    order = [
        r["doc_id"]
        for r in sorted(rows.values(), key=lambda r: r["fused_rank"])
    ]
    assert order == [11, 10, 13, 12]


def test_rrf_topk_cut_and_per_query_isolation(spark):
    a = spark.createDataFrame(
        [(q, d, d + 1) for q in (1, 2) for d in range(5)],
        ["query_id", "doc_id", "rank"],
    )
    b = spark.createDataFrame(
        [(1, 99, 1)], ["query_id", "doc_id", "rank"]
    )
    out = rrf_fuse(a, b, topk=3).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    assert len(per_q[1]) == 3 and len(per_q[2]) == 3
    # query 2 never sees query 1's b-side doc
    assert all(r["doc_id"] != 99 for r in per_q[2])
    # query 1's top doc is 99 (rank 1 on b) tied with doc 0 (rank 1
    # on a) -> tie breaks to smaller doc id
    q1 = sorted(per_q[1], key=lambda r: r["fused_rank"])
    assert [r["doc_id"] for r in q1][:2] == [0, 99]


def test_rrf_matches_python_model_random(spark):
    import random

    rng = random.Random(3)
    rows_a, rows_b = [], []
    for q in range(3):
        docs = rng.sample(range(50), 12)
        for i, d in enumerate(docs):
            rows_a.append((q, d, i + 1))
        docs = rng.sample(range(50), 12)
        for i, d in enumerate(docs):
            rows_b.append((q, d, i + 1))
    a = spark.createDataFrame(rows_a, ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame(rows_b, ["query_id", "doc_id", "rank"])
    got = {
        (r["query_id"], r["fused_rank"]): (r["doc_id"], r["rrf_r"])
        for r in rrf_fuse(a, b, topk=8).collect()
    }

    ra = {(q, d): r for q, d, r in rows_a}
    rb = {(q, d): r for q, d, r in rows_b}
    for q in range(3):
        cand = {d for qq, d, _ in rows_a + rows_b if qq == q}
        scored = sorted(
            (
                (
                    -round(
                        (1 / (60 + ra[(q, d)]) if (q, d) in ra else 0)
                        + (1 / (60 + rb[(q, d)]) if (q, d) in rb else 0),
                        9,
                    ),
                    d,
                )
                for d in cand
            )
        )
        for i, (neg_s, d) in enumerate(scored[:8]):
            assert got[(q, i + 1)] == (d, -neg_s)


def test_rrf_duplicate_keys_keep_best_rank(spark):
    """A ranker violating the one-row-per-(query,doc) contract must
    not fan out through the full-outer join: each leg keeps its best
    (lowest) rank per key, so the fusion equals what a correct ranker
    would have produced."""
    a = spark.createDataFrame(
        [(1, 10, 3), (1, 10, 1), (1, 11, 2)],
        ["query_id", "doc_id", "rank"],
    )
    b = spark.createDataFrame(
        [(1, 11, 2), (1, 11, 5)],
        ["query_id", "doc_id", "rank"],
    )
    rows = rrf_fuse(a, b, topk=10).collect()
    # no fan-out: one output row per (query, doc)
    keys = [(r["query_id"], r["doc_id"]) for r in rows]
    assert len(keys) == len(set(keys)) == 2
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[10]["a_rank"] == 1 and by_doc[10]["b_rank"] is None
    assert by_doc[11]["a_rank"] == 2 and by_doc[11]["b_rank"] == 2
    assert by_doc[10]["rrf_r"] == round(1 / 61, 9)
    assert by_doc[11]["rrf_r"] == round(1 / 62 + 1 / 62, 9)


def test_coordination_rank_hand_checked(spark):
    tf = spark.createDataFrame(
        [
            (1, "a", 5), (1, "b", 1),
            (2, "a", 1), (2, "b", 1), (2, "c", 9),
            (3, "a", 9),
            (7, "a", 2), (7, "b", 2),  # the query doc itself
        ],
        ["doc_id", "term", "tf"],
    )
    qt = spark.createDataFrame(
        [(7, "a"), (7, "b")], ["query_id", "term"]
    )
    got = {
        r["doc_id"]: (r["rank"], r["n_shared"], r["tf_shared"])
        for r in coordination_rank(tf, qt).collect()
    }
    assert 7 not in got  # self excluded
    # doc 1 and 2 both share 2 terms; doc 1 wins on tf (6 > 2)
    assert got[1] == (1, 2, 6)
    assert got[2] == (2, 2, 2)
    # doc 3 shares 1 term, ranks last despite the biggest tf
    assert got[3] == (3, 1, 9)


def test_fusion_plan_is_jvm_only(spark):
    a = spark.createDataFrame(
        [(1, 10, 1)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 11, 1)], ["query_id", "doc_id", "rank"]
    )
    plan = (
        rrf_fuse(a, b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
