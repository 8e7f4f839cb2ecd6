"""Session-lifetime cache soak (VERDICT r7 #7).

The r6 ADVICE leak class: an operator that persists intermediates and
releases them on the happy path can still accumulate blocks across
REPEATED calls in one long-lived session (the star path leaked its
band/docset caches until minhash.py:507's unpersist). This regression
runs the full star-backend curation funnel several times in one
session and asserts storage returns to baseline — the property a
streaming/foreachBatch deployment depends on, where "per call" means
"per micro-batch, forever".
"""

from __future__ import annotations

import time

from data_engineering_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
N_CALLS = 4


def _blocks(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _settle(spark, target: int, tries: int = 120) -> int:
    """localCheckpoint blocks are freed by the ContextCleaner when the
    JVM GCs the RDD (weak references) — after the python frames are
    gone, nudge GC and poll until the count settles or tries run out."""
    import gc

    n = _blocks(spark)
    for _ in range(tries):
        if n <= target:
            return n
        # python first: py4j holds JVM references for every DataFrame
        # the test loop created — the JVM can't collect (and the
        # ContextCleaner can't release) checkpoint RDDs that python
        # still pins
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        try:
            spark.sparkContext._jvm.System.runFinalization()
        except Exception:
            pass
        time.sleep(0.5)
        n = _blocks(spark)
    return n


def test_star_curation_soak_storage_returns_to_baseline(spark):
    spark.catalog.clearCache()
    baseline = _settle(spark, 0)

    per_call = []
    for _ in range(N_CALLS):
        QUERIES["q_corpus_curated_star"](spark, SF).write.format(
            "noop"
        ).mode("overwrite").save()
        per_call.append(_blocks(spark))

    # steady state, not monotone growth: whatever residual one call
    # leaves (GC-pinned checkpoint labels), call N must not stack N of
    # them (the r6 leak added band+docset blocks EVERY call). The raw
    # post-call reading races the ContextCleaner — identical commits
    # measured [4,7,7,10] and [4,5,6,6] on consecutive runs while BOTH
    # settled to 1 block — so the growth assertion reads a SETTLED
    # count (the r6 leak class pins GC-proof blocks that no settle can
    # drain: +3-4/call is still far outside the tolerance).
    steady = _settle(spark, per_call[0] + 2, tries=30)
    assert steady <= per_call[0] + 2, (
        f"storage grows per call: {per_call} (settled {steady})"
    )

    # and after the frames are dead, storage must come back down to
    # the pre-soak baseline (nothing session-pinned)
    spark.catalog.clearCache()
    final = _settle(spark, baseline)
    # +2: the ContextCleaner drains its queue asynchronously and a
    # shared-session run can leave a couple of blocks mid-queue past
    # the settle window; the leak class adds 3-4 blocks PER CALL
    # (12-16 over the soak), still far outside this tolerance
    assert final <= baseline + 2, (
        f"soak left {final - baseline} blocks pinned "
        f"(baseline {baseline}, per-call {per_call})"
    )


def test_conversation_dedup_soak_storage_returns_to_baseline(spark):
    """conversation_dedup(release_cache=True) must not pin its key
    cache across repeated calls (VERDICT r10 nit #3 — previously the
    internal persist was never released and this path was outside
    soak coverage)."""
    from data_engineering_spark.operators.sft import (
        conversation_dedup,
        synthesize_turns,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spark.catalog.clearCache()
    baseline = _settle(spark, 0)

    per_call = []
    for _ in range(N_CALLS):
        conversation_dedup(
            synthesize_turns(docs), release_cache=True
        ).write.format("noop").mode("overwrite").save()
        per_call.append(_blocks(spark))

    steady = _settle(spark, per_call[0] + 2, tries=30)
    assert steady <= per_call[0] + 2, (  # settled reading, see above
        f"storage grows per call: {per_call} (settled {steady})"
    )
    spark.catalog.clearCache()
    final = _settle(spark, baseline)
    assert final <= baseline + 2, (
        f"dedup soak left blocks pinned: {final} vs {baseline}"
    )


def test_dsir_soak_storage_returns_to_baseline(spark):
    """Same property for dsir_select(release_cache=True) — the other
    unbounded-cache path named by VERDICT r10 nit #3 (raw_counts
    persisted MEMORY_AND_DISK, never unpersisted)."""
    from pyspark.sql import functions as F

    from data_engineering_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.filter(F.col("lang") == "en").limit(20)
    spark.catalog.clearCache()
    baseline = _settle(spark, 0)

    per_call = []
    for _ in range(N_CALLS):
        dsir_select(
            docs, target, k=10, num_buckets=512, release_cache=True
        ).write.format("noop").mode("overwrite").save()
        per_call.append(_blocks(spark))

    steady = _settle(spark, per_call[0] + 2, tries=30)
    assert steady <= per_call[0] + 2, (  # settled reading, see above
        f"storage grows per call: {per_call} (settled {steady})"
    )
    spark.catalog.clearCache()
    final = _settle(spark, baseline)
    assert final <= baseline + 2, (
        f"dsir soak left blocks pinned: {final} vs {baseline}"
    )


def test_cdc_pipeline_soak_storage_returns_to_baseline(spark):
    """Same property for the CDC ingest path (the other heavyweight
    repeated-call surface: one process_batch per micro-batch). Reuses
    bench.bench_cdc_ingest — the REAL two-batch create+merge pipeline
    over proper Debezium envelopes — as the unit of repetition."""
    from bench import bench_cdc_ingest

    spark.catalog.clearCache()
    baseline = _settle(spark, 0)

    per_call = []
    for _ in range(N_CALLS):
        bench_cdc_ingest(spark, SF)
        per_call.append(_blocks(spark))

    steady = _settle(spark, per_call[0] + 2, tries=30)
    assert steady <= per_call[0] + 2, (  # settled reading, see above
        f"storage grows per call: {per_call} (settled {steady})"
    )
    spark.catalog.clearCache()
    final = _settle(spark, baseline)
    assert final <= baseline + 2, (  # same tolerance rationale as above
        f"CDC soak left blocks pinned: {final} vs baseline {baseline}"
    )


def test_turn_token_counts_soak_on_distinct_frames(spark):
    """turn_token_counts(release_cache=True) must not pin its internal
    turn-projection persist across repeated calls on DISTINCT turn
    frames (VERDICT r11 #6 — distinct frames defeat the session-carry
    cache-key reuse the default persist exists for, so a leak here
    adds one pinned catalog entry per call that settle cannot
    free)."""
    from pyspark.sql import functions as F

    from data_engineering_spark.operators.sft import (
        synthesize_turns,
        turn_token_counts,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = [("a", "b"), ("ab", "c")]
    spark.catalog.clearCache()
    baseline = _settle(spark, 0)

    per_call = []
    for k in range(N_CALLS):
        # a per-call doc slice makes each turn frame plan-distinct —
        # the leak mode the release contract exists for
        turns = synthesize_turns(
            docs.filter(F.col("doc_id") % 7 != k)
        )
        turn_token_counts(
            turns, merges, release_cache=True
        ).write.format("noop").mode("overwrite").save()
        per_call.append(_blocks(spark))

    steady = _settle(spark, per_call[0] + 2, tries=30)
    assert steady <= per_call[0] + 2, (  # settled reading, see above
        f"storage grows per call: {per_call} (settled {steady})"
    )
    spark.catalog.clearCache()
    final = _settle(spark, baseline)
    assert final <= baseline + 2, (
        f"turn soak left blocks pinned: {final} vs {baseline}"
    )


def test_cc_failure_path_releases_all_marked_frames(spark):
    """A mid-loop connected_components failure (non-convergence raise)
    must release EVERY persist-marked frame — including the lazily
    marked init labels and the in-flight round frame (ADVICE r11).
    Before the fix, the except path released only base and e1."""
    import pytest

    from data_engineering_spark.operators.graph import (
        connected_components,
    )

    # a 12-vertex path graph needs ~4 pointer-jumping rounds; cap at 1
    # so the loop raises mid-flight with a materialized round frame
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    spark.catalog.clearCache()
    baseline = _settle(spark, 0)

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)

    final = _settle(spark, baseline)
    assert final <= baseline, (
        f"CC failure path left blocks pinned: {final} vs {baseline}"
    )
