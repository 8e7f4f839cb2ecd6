"""Continuous corpus curation: streaming near-dup-gated ingestion.

The batch operators already cover the two halves of the 100 TB dedup
story — `minhash_band_index` (persistent (doc, band, bucket) LSH state,
~1 KB/doc) and `minhash_incremental_pairs` (probe a batch against the
index at batch cost, corpus text touched only semi-join-pruned). This
module closes the loop for the ingestion-pipeline shape: a Structured
Streaming source of new documents where each micro-batch is near-dup
checked against everything retained so far, survivors append to the
corpus table AND to the band index, and the whole thing is
exactly-once across restarts.

Semantics (deterministic, documented for the offline twin in tests):
a new document is dropped iff it near-dups (>= `threshold` verified
Jaccard) any RETAINED corpus document, or a smaller-id document of its
own batch. Documents dropped in an earlier batch are gone — they are
not in the corpus, so they cannot suppress later arrivals (retained-
first-occurrence semantics, the standard crawl-ingest rule). New doc
ids must be disjoint from corpus ids (same contract as
`minhash_incremental_pairs`).

Scale shape: per batch the corpus participates as (a) the fixed-width
band index probe join and (b) ONE semi-join-pruned text scan over
candidate docs only — never a full corpus pass. The survivors' index
rows are recomputed from the batch (a second shingle pass over the
BATCH, not the corpus) and appended, so index == full rebuild of the
retained corpus at every step (asserted in tests). Appends to plain
parquet are not idempotent, hence the batch-id ledger
(`runner.idempotent_sink`) gating replays after crash-between-
sink-and-checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from data_engineering_spark.operators.minhash import (
    minhash_band_index,
    minhash_incremental_pairs,
    minhash_near_dup_pairs,
)
from data_engineering_spark.streaming.runner import (
    file_envelope_stream,
    idempotent_sink,
)


def _local_only(*paths: str) -> None:
    """The corpus/index existence probes, commit markers, and staging
    GC all use driver-local filesystem calls; a URI-addressed store
    (s3a://, hdfs://...) would make os.path.exists silently answer
    False and DISABLE the corpus gate rather than fail. Refuse loudly —
    object-store deployments route through a transactional table
    backend (MergeTable/Iceberg), not this local-parquet commit
    protocol."""
    for p in paths:
        if "://" in p:
            raise NotImplementedError(
                "curation_stream requires driver-local paths (its "
                f"existence probes and commit markers are os-level); got {p!r}"
            )


def _gate(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    index_path: str,
    threshold: float,
    kw: dict,
    materialize: bool = True,
) -> DataFrame:
    """The near-dup gate: survivors of `batch` against the retained
    corpus (and smaller-id batch mates). `materialize=True` checkpoints
    the survivors so a caller with several consumers (count + two
    appends) runs the probe once; callers that immediately persist the
    frame to parquet themselves (the staged commit path) pass False
    and save the extra action. The probes release their internal
    caches (`release_cache=True`) — the stream is a long-lived session
    and leaked MEMORY_AND_DISK blocks would accumulate per batch."""
    id_col = kw["id_col"]
    have_corpus = os.path.exists(corpus_path)
    if have_corpus:
        corpus = spark.read.parquet(corpus_path)
        index = spark.read.parquet(index_path)
        pairs = minhash_incremental_pairs(
            batch,
            corpus,
            index,
            threshold=threshold,
            release_cache=True,
            **kw,
        )
        new_ids = batch.select(F.col(id_col).alias("doc")).distinct()
        new_b = new_ids.withColumnRenamed("doc", "doc_b")
        # every pair has >= 1 new member (the probe's contract), so:
        # doc_b not new -> doc_a is the new one with a corpus partner
        # (drop doc_a); doc_b new -> its partner is corpus-or-batch
        # with the smaller id either way (drop doc_b)
        dropped = (
            pairs.join(new_b, "doc_b", "left_anti")
            .select(F.col("doc_a").alias("doc"))
            .union(
                pairs.join(new_b, "doc_b", "left_semi").select(
                    F.col("doc_b").alias("doc")
                )
            )
            .distinct()
        )
    else:
        pairs = minhash_near_dup_pairs(
            batch, threshold=threshold, release_cache=True, **kw
        )
        dropped = pairs.select(F.col("doc_b").alias("doc")).distinct()

    survivors = batch.join(
        dropped.withColumnRenamed("doc", id_col), id_col, "left_anti"
    )
    if not materialize:
        return survivors
    # one action materializes the gate; the caller's consumers reuse
    # the checkpointed rows instead of re-running the probe (direct
    # localCheckpoint would re-execute the plan un-optimized —
    # materialize.py)
    from data_engineering_spark.operators.materialize import (
        eager_checkpoint,
    )

    return eager_checkpoint(survivors)


def _quality_filter(
    batch: DataFrame,
    quality_gate: str | None,
    id_col: str,
    text_col: str,
    classifier_weights: DataFrame | None,
    classifier_bias: int,
    classifier_buckets: int,
) -> DataFrame:
    """The funnel's quality stage, applied INCREMENTALLY to each
    micro-batch before the near-dup gate (mirrors curate_corpus's
    stage order: quality survivors are what near-dedup sees).  A
    quality-rejected document never reaches the corpus OR the band
    index, so it can never suppress a later arrival — per-document
    statelessness is exactly why the stage streams for free."""
    if quality_gate is None:
        return batch
    if quality_gate == "gopher":
        from data_engineering_spark.operators.filters import (
            gopher_metrics,
        )

        keep = gopher_metrics(
            batch, id_col=id_col, text_col=text_col
        ).filter(F.col("keep")).select(id_col)
        return batch.join(keep, id_col, "left_semi")
    if quality_gate == "classifier":
        if classifier_weights is None:
            raise ValueError(
                "quality_gate='classifier' needs classifier_weights"
            )
        from data_engineering_spark.operators.classifier import (
            linear_classifier_score,
        )

        scored = linear_classifier_score(
            batch,
            classifier_weights,
            id_col=id_col,
            text_col=text_col,
            num_buckets=classifier_buckets,
            bias=classifier_bias,
            bucket_hash="md5",
        )
        keep = scored.filter(F.col("label")).select(id_col)
        return batch.join(keep, id_col, "left_semi")
    raise ValueError(f"unknown quality_gate: {quality_gate!r}")


def curate_batch(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    num_hashes: int = 64,
    num_bands: int = 32,
    quality_gate: str | None = None,
    classifier_weights: DataFrame | None = None,
    classifier_bias: int = 0,
    classifier_buckets: int = 4096,
) -> int:
    """Apply one ingest batch: near-dup gate, then append survivors to
    the corpus table and their band rows to the index. Returns the
    number of retained documents. Pure batch function — the offline
    twin in tests folds it over batches to pin sequential semantics.

    NOT crash-safe between its two appends: a failure after the corpus
    append but before the index append loses the batch's index rows on
    any blind retry (the re-probe sees the batch's own ids in the
    corpus and drops every survivor as a self-dup). The streaming sink
    therefore uses `curate_batch_committed`, whose staged protocol
    resumes mid-batch; call this form only where a failed run's state
    is discarded wholesale."""
    kw = dict(
        id_col=id_col,
        text_col=text_col,
        n=n,
        num_hashes=num_hashes,
        num_bands=num_bands,
    )
    _local_only(corpus_path, index_path)
    batch = _quality_filter(
        batch, quality_gate, id_col, text_col,
        classifier_weights, classifier_bias, classifier_buckets,
    )
    survivors = _gate(spark, batch, corpus_path, index_path, threshold, kw)
    retained = survivors.count()
    if retained:
        survivors.write.mode("append").parquet(corpus_path)
        minhash_band_index(survivors, **kw).write.mode("append").parquet(
            index_path
        )
    return retained


def curate_batch_committed(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    corpus_path: str,
    index_path: str,
    commit_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    num_hashes: int = 64,
    num_bands: int = 32,
    quality_gate: str | None = None,
    classifier_weights: DataFrame | None = None,
    classifier_bias: int = 0,
    classifier_buckets: int = 4096,
) -> int:
    """`curate_batch` with a write-ahead commit protocol, closing the
    crash window the plain function has: if a run dies BETWEEN the
    corpus append and the index append, a blind replay re-probes a
    corpus that already contains the batch's ids — every survivor
    self-pairs at Jaccard 1, gets dropped, and the index rows are lost
    forever (future dups of those docs go undetected).

    Protocol, per batch id (every step idempotent on replay):
    1. stage: probe the PRE-batch corpus and overwrite-write survivors
       to `commit_root/stage-<id>` — the probe runs only while no
       staging exists, so it always sees the pre-batch corpus;
    2. corpus append from staging, then marker `corpus-<id>`;
    3. index append (band rows recomputed from staged survivors),
       then marker `index-<id>`.
    A replay resumes at the first step whose marker is missing, reading
    survivors back from staging rather than re-deciding them — and,
    because a crash can land AFTER an append returns but BEFORE its
    marker write, a replayed append first anti-joins the staged rows
    against what the target already holds (by id for the corpus, by
    (doc, band) for the index), so a marker-less-but-applied append
    never duplicates rows. The anti-join target scan is paid ONLY on
    replays (detected by staging already existing at entry); the
    first run of a batch skips it. The residual limit is a torn
    part-file inside one append on a non-atomic store — same
    posix-rename caveat as MergeTable, documented in SCALE.md.

    Retention: an older batch's staging AND markers are only needed
    until the batch is fully committed (the streaming checkpoint
    advances strictly after the sink returns), so both are
    garbage-collected here for ids below the current batch — the
    commit root stays O(in-flight batches), not O(stream lifetime)."""
    kw = dict(
        id_col=id_col,
        text_col=text_col,
        n=n,
        num_hashes=num_hashes,
        num_bands=num_bands,
    )
    import shutil

    _local_only(corpus_path, index_path, commit_root)
    # quality first, near-dup second — the funnel's stage order. The
    # filter is a pure per-document function of the batch, so replays
    # re-derive the identical survivor set (no extra staging needed).
    batch = _quality_filter(
        batch, quality_gate, id_col, text_col,
        classifier_weights, classifier_bias, classifier_buckets,
    )
    os.makedirs(commit_root, exist_ok=True)
    stage = os.path.join(commit_root, f"stage-{batch_id:020d}")
    corpus_marker = os.path.join(commit_root, f"corpus-{batch_id:020d}")
    index_marker = os.path.join(commit_root, f"index-{batch_id:020d}")

    for name in sorted(os.listdir(commit_root)):
        if not name.startswith("corpus-"):
            continue
        sid = name[len("corpus-"):]
        if not (sid.isdigit() and int(sid) < batch_id):
            continue
        old_index = os.path.join(commit_root, f"index-{sid}")
        if os.path.exists(old_index):
            # stage first: if a crash interrupts this GC, the markers
            # still prove the batch committed and the next GC retries
            shutil.rmtree(
                os.path.join(commit_root, f"stage-{sid}"),
                ignore_errors=True,
            )
            os.remove(old_index)
            os.remove(os.path.join(commit_root, name))

    replayed = os.path.exists(os.path.join(stage, "_SUCCESS"))
    if not replayed:
        survivors = _gate(
            spark,
            batch,
            corpus_path,
            index_path,
            threshold,
            kw,
            materialize=False,
        )
        # overwrite: a half-written staging from a crash is replaced
        survivors.write.mode("overwrite").parquet(stage)
    staged = spark.read.parquet(stage)
    retained = staged.count()
    if retained and not os.path.exists(corpus_marker):
        to_corpus = staged
        if replayed and os.path.exists(corpus_path):
            to_corpus = staged.join(
                spark.read.parquet(corpus_path).select(id_col),
                id_col,
                "left_anti",
            )
        to_corpus.write.mode("append").parquet(corpus_path)
    _touch(corpus_marker)
    if retained and not os.path.exists(index_marker):
        rows = minhash_band_index(staged, **kw)
        if replayed and os.path.exists(index_path):
            rows = rows.join(
                spark.read.parquet(index_path).select("doc", "band"),
                ["doc", "band"],
                "left_anti",
            )
        rows.write.mode("append").parquet(index_path)
    _touch(index_marker)
    return retained


def _touch(path: str) -> None:
    with open(path, "w") as f:
        f.write("committed\n")


def run_curation_stream(
    spark: SparkSession,
    input_path: str,
    schema,
    corpus_path: str,
    index_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
    **curate_kw,
) -> StreamingQuery:
    """Stream document batches from `input_path` (parquet drops —
    size-bounded landing files are the batch bound, same pattern as
    `file_envelope_stream`) through the near-dup gate into the
    corpus + index tables. Exactly-once: Structured Streaming replays
    a micro-batch after a crash between side effect and checkpoint
    commit, and plain-parquet appends would double — the sink is the
    staged `curate_batch_committed` (resumes a half-applied batch at
    the exact step that was missing), with the batch-id ledger beside
    the checkpoint as the fast-path skip for fully-committed batches."""
    stream = file_envelope_stream(
        spark, input_path, schema, max_files_per_trigger
    )
    commit_root = os.path.join(checkpoint_dir, "_commits")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        curate_batch_committed(
            spark,
            batch_df,
            batch_id,
            corpus_path,
            index_path,
            commit_root,
            **curate_kw,
        )

    writer = (
        stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            idempotent_sink(_sink, os.path.join(checkpoint_dir, "_ledger"))
        )
    )
    writer = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="10 seconds")
    )
    return writer.start()
