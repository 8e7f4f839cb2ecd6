"""Deterministic sampling + chunking operator properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.sampling import (
    bernoulli_sample,
    stratified_topk_sample,
)
from data_engineering_spark.operators.text import chunk_documents


def test_bernoulli_nested_and_independent(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    s10 = {r["id"] for r in bernoulli_sample(df, "id", 0.1).collect()}
    s20 = {r["id"] for r in bernoulli_sample(df, "id", 0.2).collect()}
    # same salt, higher rate -> strict superset (nested samples)
    assert s10 < s20
    assert 0.05 < len(s10) / 2000 < 0.15
    # different salt -> a different (independent) sample
    other = {
        r["id"] for r in bernoulli_sample(df, "id", 0.1, salt="x").collect()
    }
    assert other != s10
    # deterministic: same call twice -> identical
    again = {r["id"] for r in bernoulli_sample(df, "id", 0.1).collect()}
    assert again == s10


def test_stratified_exact_k(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)], ["id", "g"]
    )
    out = stratified_topk_sample(df, ["g"], "id", k=25)
    counts = {
        r["g"]: r["n"]
        for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 25, "b": 25}


def test_chunks_cover_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, "only three words")],
                               ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=40, overlap=8).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    doc1 = [r for r in rows if r["doc_id"] == 1]
    doc2 = [r for r in rows if r["doc_id"] == 2]
    # 100 tokens, stride 32: chunks at 0,32,64 cover to 104 -> 3 chunks
    assert [r["chunk_idx"] for r in doc1] == [0, 1, 2]
    assert doc1[0]["chunk_text"].split()[:2] == ["w0", "w1"]
    # consecutive chunks overlap by 8 tokens
    c0, c1 = doc1[0]["chunk_text"].split(), doc1[1]["chunk_text"].split()
    assert c0[-8:] == c1[:8]
    # tail chunk is short: tokens 64..99 -> 36
    assert doc1[2]["n_tokens"] == 36
    # every token appears in some chunk
    covered = set().union(*[set(r["chunk_text"].split()) for r in doc1])
    assert covered == {f"w{i}" for i in range(100)}
    # short doc -> exactly one whole chunk
    assert len(doc2) == 1 and doc2[0]["chunk_text"] == "only three words"
    assert doc2[0]["n_tokens"] == 3


def test_pack_chunks_closed_form_vs_strict(spark):
    from data_engineering_spark.operators.text import (
        chunk_documents,
        pack_chunks,
        pack_chunks_strict,
    )

    text = " ".join(f"w{i}" for i in range(500))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    chunks = chunk_documents(df, chunk_tokens=40, overlap=8)

    strict = pack_chunks_strict(chunks, budget_tokens=120).collect()
    # hard ceiling holds for every bin
    totals = {}
    for r in strict:
        totals[r["pack_id"]] = totals.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(t <= 120 for t in totals.values()), totals
    # chunks are 40 tokens (tail aside): 120/40 -> exactly 3 per full bin
    full_bins = [t for t in sorted(totals)[:-1]]
    assert all(totals[b] == 120 for b in full_bins)

    # closed-form agrees with strict when bins divide evenly (no
    # overflow case): same bin count and same boundaries
    closed = pack_chunks(chunks, budget_tokens=120).collect()
    c_map = {(r["doc_id"], r["chunk_idx"]): r["pack_id"] for r in closed}
    s_map = {(r["doc_id"], r["chunk_idx"]): r["pack_id"] for r in strict}
    assert c_map == s_map


def test_pack_chunks_strict_sharded(spark):
    """shard_chunks parallelizes one giant partition key: the hard
    token ceiling still holds for EVERY bin, pack ids stay unique and
    dense per key, and bins never span a shard boundary (at most one
    under-filled bin per shard)."""
    from data_engineering_spark.operators.text import (
        chunk_documents,
        pack_chunks_strict,
    )

    text = " ".join(f"w{i}" for i in range(2000))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    chunks = chunk_documents(df, chunk_tokens=40, overlap=8)
    n_chunks = chunks.count()

    out = pack_chunks_strict(
        chunks, budget_tokens=120, shard_chunks=13
    ).collect()
    assert len(out) == n_chunks
    totals: dict[int, int] = {}
    members: dict[int, list[int]] = {}
    for r in out:
        totals[r["pack_id"]] = totals.get(r["pack_id"], 0) + r["n_tokens"]
        members.setdefault(r["pack_id"], []).append(r["chunk_idx"])
    # hard ceiling survives sharding
    assert all(t <= 120 for t in totals.values()), totals
    # dense 0..n-1 ids after renumbering
    assert sorted(totals) == list(range(len(totals)))
    # bins hold consecutive chunk runs and never cross a shard edge:
    # chunk_idx // 13 must be constant within a bin
    for pid, idxs in members.items():
        assert {i // 13 for i in idxs} and len({i // 13 for i in idxs}) == 1, (
            pid, idxs
        )
        srt = sorted(idxs)
        assert srt == list(range(srt[0], srt[0] + len(srt)))
    # pack_pos is 0..k-1 within each bin
    pos = {}
    for r in out:
        pos.setdefault(r["pack_id"], []).append(r["pack_pos"])
    assert all(sorted(v) == list(range(len(v))) for v in pos.values())


def test_content_defined_chunks_realign_after_edit(spark):
    """The dedup-friendly property: prepending tokens to a document
    shifts only the leading chunk(s) — once the rolling boundary
    re-synchronizes, every later chunk is byte-identical to the
    original's, so chunk-level exact dedup still collapses the shared
    tail. (Fixed-size chunking would shift EVERY chunk.)"""
    import random

    from data_engineering_spark.operators.text import (
        content_defined_chunks,
    )

    rng = random.Random(7)
    words = [f"w{rng.randint(0, 500)}" for _ in range(400)]
    original = " ".join(words)
    edited = "inserted preamble tokens " + original

    df = spark.createDataFrame(
        [(1, original), (2, edited)], "doc_id long, text string"
    )
    out = content_defined_chunks(df, mean_tokens=16)
    chunks = {1: [], 2: []}
    for r in out.collect():
        chunks[r["doc"]].append((r["chunk_id"], r["chunk_text"]))
    a = [t for _, t in sorted(chunks[1])]
    b = [t for _, t in sorted(chunks[2])]
    # token counts reassemble exactly
    assert " ".join(a) == original and " ".join(b) == edited
    # the shared tail re-aligns: a long common chunk suffix survives
    common_suffix = 0
    for x, y in zip(reversed(a), reversed(b)):
        if x != y:
            break
        common_suffix += 1
    assert common_suffix >= max(len(a) - 2, 1), (len(a), len(b),
                                                 common_suffix)


def test_mixture_sample_rates_and_drop(spark):
    from data_engineering_spark.operators.sampling import mixture_sample

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "books")
        .otherwise("code")
        .alias("domain"),
    )
    # web: 1000 -> ~300; books: capped (target > actual keeps all);
    # code: absent from targets -> dropped entirely
    out = mixture_sample(
        df, "domain", "doc_id", {"web": 300, "books": 5000}, salt="s"
    )
    got = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) == {"web", "books"}
    assert got["books"] == 1000  # rate clamps at 1.0
    assert 200 <= got["web"] <= 400  # ~Binomial(1000, 0.3)

    # determinism + nesting: a higher target yields a superset
    bigger = mixture_sample(
        df, "domain", "doc_id", {"web": 600, "books": 5000}, salt="s"
    )
    small_ids = {r["doc_id"] for r in out.collect()}
    big_ids = {r["doc_id"] for r in bigger.collect()}
    assert small_ids <= big_ids
