"""Continuous corpus curation: the streaming near-dup ingest gate.

Three invariants:
- stream == sequential batch application of `curate_batch` (the sink IS
  that function; here the checkpointed/file-source wiring is under
  test, including batch ordering),
- the incrementally-maintained band index equals a full
  `minhash_band_index` rebuild of the retained corpus,
- replays (crash between append and checkpoint commit) do not
  double-append, thanks to the batch-id ledger.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_engineering_spark.operators.minhash import minhash_band_index
from data_engineering_spark.streaming.curation_stream import (
    curate_batch,
    run_curation_stream,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

# words give 3-shingles; "edited" variants share most shingles with
# their base (near-dups at threshold 0.5), "fresh" texts share none
_BASE = "the quick brown fox jumps over the lazy dog near the old river bank"
_EDIT = "the quick brown fox jumps over the lazy dog near the old river bend"
_FRESH1 = "completely different words describing snow capped mountain peaks at dawn"
_FRESH2 = "a third unrelated subject entirely about submarine cable maintenance routines"
_FRESH3 = "yet another topic concerning medieval trade guild apprenticeship customs"

# batch 1: 1 kept, 2 is an in-batch near-dup of 1 (dropped), 3 fresh.
# batch 2: 4 near-dups retained doc 1 (dropped via the INDEX probe),
#          5 fresh.
# batch 3: 6 near-dups doc 2 — but 2 was DROPPED, so 6 must survive
#          (retained-first-occurrence semantics)... except 2's text is
#          a near-dup of 1's, so 6 still collides with RETAINED 1 and
#          is dropped; 7 is fresh.
BATCHES = [
    [(1, _BASE), (2, _EDIT), (3, _FRESH1)],
    [(4, _EDIT), (5, _FRESH2)],
    [(6, _BASE + " side"), (7, _FRESH3)],
]


def _write_batches(spark, src):
    import glob
    import shutil

    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(BATCHES):
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        tmp = os.path.join(src, f"_stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        # file source orders by modification time; make it unambiguous
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))


def _corpus_ids(spark, path):
    return {
        r["doc_id"] for r in spark.read.parquet(path).select("doc_id").collect()
    }


KW = dict(threshold=0.5, num_hashes=64, num_bands=32)


def test_curation_stream_matches_sequential_batches(spark, tmp_path):
    src = str(tmp_path / "incoming")
    _write_batches(spark, src)

    # offline twin: fold curate_batch over the batches in order
    seq_corpus = str(tmp_path / "seq_corpus")
    seq_index = str(tmp_path / "seq_index")
    for rows in BATCHES:
        curate_batch(
            spark,
            spark.createDataFrame(rows, DOC_SCHEMA),
            seq_corpus,
            seq_index,
            **KW,
        )
    expected = _corpus_ids(spark, seq_corpus)
    # pin the semantics themselves, not just stream==batch: 2 drops
    # in-batch vs 1; 4 drops vs retained 1 via the index probe; 6
    # drops vs retained 1 (NOT vs dropped 2); fresh docs survive
    assert expected == {1, 3, 5, 7}

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    q = run_curation_stream(
        spark,
        src,
        DOC_SCHEMA,
        corpus,
        index,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        **KW,
    )
    q.awaitTermination(300)

    assert _corpus_ids(spark, corpus) == expected

    # the incrementally-appended index must equal a full rebuild of the
    # retained corpus (same rows, not just same docs)
    rebuilt = {
        (r["doc"], r["band"], r["bucket"])
        for r in minhash_band_index(
            spark.read.parquet(corpus),
            num_hashes=KW["num_hashes"],
            num_bands=KW["num_bands"],
        ).collect()
    }
    incremental = {
        (r["doc"], r["band"], r["bucket"])
        for r in spark.read.parquet(index).collect()
    }
    assert incremental == rebuilt and incremental

    # restart on the same checkpoint: no new files, no state change
    q2 = run_curation_stream(
        spark,
        src,
        DOC_SCHEMA,
        corpus,
        index,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        **KW,
    )
    q2.awaitTermination(300)
    assert _corpus_ids(spark, corpus) == expected


def test_curation_replay_does_not_double_append(spark, tmp_path):
    """Simulate the crash-between-sink-and-checkpoint replay: the
    ledger-wrapped sink must skip a batch id it already committed."""
    from data_engineering_spark.streaming.runner import idempotent_sink

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    batch = spark.createDataFrame(BATCHES[0], DOC_SCHEMA)

    def _sink(batch_df, batch_id):
        curate_batch(spark, batch_df, corpus, index, **KW)

    wrapped = idempotent_sink(_sink, str(tmp_path / "ledger"))
    wrapped(batch, 0)
    first = _corpus_ids(spark, corpus)
    wrapped(batch, 0)  # replay of the same micro-batch
    assert _corpus_ids(spark, corpus) == first == {1, 3}


def test_committed_batch_resumes_after_mid_batch_crash(spark, tmp_path):
    """Crash AFTER the corpus append but BEFORE the index append: the
    staged protocol must resume and complete the index append on
    retry. (A blind `curate_batch` retry here would lose the index
    rows forever: the re-probe sees the batch's own ids in the corpus
    and drops every survivor as a self-dup.)"""
    import data_engineering_spark.streaming.curation_stream as cs

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    commits = str(tmp_path / "commits")

    # batch 0 commits cleanly
    cs.curate_batch_committed(
        spark,
        spark.createDataFrame(BATCHES[0], DOC_SCHEMA),
        0,
        corpus,
        index,
        commits,
        **KW,
    )

    # batch 1: fail exactly at the index append (first call after the
    # corpus marker exists)
    real_build = cs.minhash_band_index
    calls = {"n": 0}

    def exploding_build(*a, **k):
        calls["n"] += 1
        raise RuntimeError("crash before index append")

    cs.minhash_band_index = exploding_build
    batch1 = spark.createDataFrame(BATCHES[1], DOC_SCHEMA)
    try:
        try:
            cs.curate_batch_committed(
                spark, batch1, 1, corpus, index, commits, **KW
            )
            raise AssertionError("expected injected crash")
        except RuntimeError:
            pass
    finally:
        cs.minhash_band_index = real_build
    assert calls["n"] == 1
    # corpus already has batch 1's survivor, index does not
    assert _corpus_ids(spark, corpus) == {1, 3, 5}

    # replay (what the restarted stream does): must NOT re-probe into
    # self-dup oblivion, must NOT double-append, must finish the index
    retained = cs.curate_batch_committed(
        spark, batch1, 1, corpus, index, commits, **KW
    )
    assert retained == 1
    assert _corpus_ids(spark, corpus) == {1, 3, 5}
    assert (
        spark.read.parquet(corpus).count() == 3
    ), "corpus append must not replay"
    rebuilt = {
        (r["doc"], r["band"], r["bucket"])
        for r in real_build(
            spark.read.parquet(corpus),
            num_hashes=KW["num_hashes"],
            num_bands=KW["num_bands"],
        ).collect()
    }
    incremental = {
        (r["doc"], r["band"], r["bucket"])
        for r in spark.read.parquet(index).collect()
    }
    assert incremental == rebuilt

    # batch 2 proceeds normally on the repaired state
    cs.curate_batch_committed(
        spark,
        spark.createDataFrame(BATCHES[2], DOC_SCHEMA),
        2,
        corpus,
        index,
        commits,
        **KW,
    )
    assert _corpus_ids(spark, corpus) == {1, 3, 5, 7}

    # committed stage dirs AND markers below batch 2 were
    # garbage-collected; batch 2's own artifacts (the in-flight
    # retention window) remain
    left = sorted(os.listdir(commits))
    assert left == [
        f"corpus-{2:020d}",
        f"index-{2:020d}",
        f"stage-{2:020d}",
    ]

    # crash window AFTER an append returns but BEFORE its marker:
    # simulate by removing batch 2's corpus marker and replaying — the
    # replay detects existing staging and anti-joins, so no row dupes
    os.remove(os.path.join(commits, f"corpus-{2:020d}"))
    before = spark.read.parquet(corpus).count()
    cs.curate_batch_committed(
        spark,
        spark.createDataFrame(BATCHES[2], DOC_SCHEMA),
        2,
        corpus,
        index,
        commits,
        **KW,
    )
    assert spark.read.parquet(corpus).count() == before
    assert _corpus_ids(spark, corpus) == {1, 3, 5, 7}


def test_curation_refuses_non_local_paths(spark, tmp_path):
    """URI-addressed stores would silently disable the corpus gate
    (os.path.exists is driver-local); the module must refuse them."""
    import pytest

    import data_engineering_spark.streaming.curation_stream as cs

    batch = spark.createDataFrame(BATCHES[0], DOC_SCHEMA)
    with pytest.raises(NotImplementedError, match="driver-local"):
        cs.curate_batch(
            spark, batch, "s3a://bucket/corpus", str(tmp_path / "i"), **KW
        )
    with pytest.raises(NotImplementedError, match="driver-local"):
        cs.curate_batch_committed(
            spark,
            batch,
            0,
            str(tmp_path / "c"),
            "hdfs://nn/index",
            str(tmp_path / "commits"),
            **KW,
        )


def test_curation_batch_empty_survivors(spark, tmp_path):
    """A batch that is ENTIRELY near-dups appends nothing (no empty
    parquet commits) and leaves corpus and index untouched."""
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    curate_batch(
        spark, spark.createDataFrame(BATCHES[0], DOC_SCHEMA), corpus, index, **KW
    )
    files_before = sorted(os.listdir(corpus))
    retained = curate_batch(
        spark,
        spark.createDataFrame([(9, _BASE + " extra"), (10, _EDIT)], DOC_SCHEMA),
        corpus,
        index,
        **KW,
    )
    assert retained == 0
    assert sorted(os.listdir(corpus)) == files_before
    assert _corpus_ids(spark, corpus) == {1, 3}


def test_classifier_gated_stream_matches_sequential(spark, tmp_path):
    """The classifier-gated funnel runs as a stream (r6 verdict item
    8): quality first, near-dup second, per micro-batch. A 3-batch
    drain must leave EXACTLY the corpus the sequential curate_batch
    fold with the same gate leaves — and a quality-rejected document
    must never reach the corpus, the index, or (being absent from
    both) suppress a later near-dup decision."""
    from data_engineering_spark.operators.classifier import (
        linear_classifier_score,
        synthetic_weights,
    )

    w = synthetic_weights(spark, 64, seed="sg", scale=50)
    all_rows = [r for b in BATCHES for r in b]
    base = {
        r["doc_id"]: r["logit"]
        for r in linear_classifier_score(
            spark.createDataFrame(all_rows, DOC_SCHEMA),
            w, num_buckets=64, bias=0, bucket_hash="md5",
        ).collect()
    }
    # bias chosen so doc 1 (the batch-1 anchor every later near-dup
    # collides with) is quality-REJECTED — the gate visibly reshapes
    # the dedup outcome relative to the ungated {1, 3, 5, 7}
    bias = -(base[1] + 1)
    gate_kw = dict(
        quality_gate="classifier",
        classifier_weights=w,
        classifier_bias=bias,
        classifier_buckets=64,
    )
    kept_q = {d for d, lg in base.items() if lg + bias > 0}
    assert 1 not in kept_q

    src = str(tmp_path / "incoming")
    _write_batches(spark, src)

    seq_corpus = str(tmp_path / "seq_corpus")
    seq_index = str(tmp_path / "seq_index")
    for rows in BATCHES:
        curate_batch(
            spark,
            spark.createDataFrame(rows, DOC_SCHEMA),
            seq_corpus,
            seq_index,
            **KW,
            **gate_kw,
        )
    expected = _corpus_ids(spark, seq_corpus)
    assert 1 not in expected
    assert expected <= kept_q  # nothing quality-rejected got in
    assert expected != {1, 3, 5, 7}  # the gate changed the outcome

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    q = run_curation_stream(
        spark,
        src,
        DOC_SCHEMA,
        corpus,
        index,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        **KW,
        **gate_kw,
    )
    q.awaitTermination(300)
    assert _corpus_ids(spark, corpus) == expected

    # incrementally-appended index == full rebuild of the retained
    # corpus, same as the ungated invariant
    rebuilt = {
        (r["doc"], r["band"], r["bucket"])
        for r in minhash_band_index(
            spark.read.parquet(corpus),
            num_hashes=KW["num_hashes"],
            num_bands=KW["num_bands"],
        ).collect()
    }
    incremental = {
        (r["doc"], r["band"], r["bucket"])
        for r in spark.read.parquet(index).collect()
    }
    assert incremental == rebuilt and incremental


def test_stream_quality_gate_rejects_unknown(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="quality_gate"):
        curate_batch(
            spark,
            spark.createDataFrame(BATCHES[0], DOC_SCHEMA),
            str(tmp_path / "c"),
            str(tmp_path / "i"),
            quality_gate="nope",
            **KW,
        )
    with pytest.raises(ValueError, match="classifier_weights"):
        curate_batch(
            spark,
            spark.createDataFrame(BATCHES[0], DOC_SCHEMA),
            str(tmp_path / "c"),
            str(tmp_path / "i"),
            quality_gate="classifier",
            **KW,
        )
