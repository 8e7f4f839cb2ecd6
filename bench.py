"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a `noop` sink write — full computation, no
driver-side collect cost, mirroring how a real pipeline materializes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_spark.queries import QUERIES  # noqa: E402
from data_engineering_spark.session import get_session  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q18_large_orders",
    "q_customer_order_counts",
    "q_events_keep_last_per_user",
    "q_events_sessionize",
    "q_doc_dedup_exact",
    "q_doc_ngram_jaccard_pairs",
    "q_doc_minhash_neardup",
    "q_cosine_topk",
    "q_embedding_similarity_join",
    "q_events_tumbling_window",
    "q07_nation_trade_flows",
    # round-3 operators (VERDICT r3 #6): quality filtering, dedup
    # clustering, bloom-pruned join reduction, lake reconciliation —
    # benched so regressions in them are visible round-over-round
    "q_doc_gopher_filters",
    "q_doc_dedup_clusters",
    "q_semi_reduced_revenue",
    "q_reconcile_drift",
    # round-4 operators: span-dedup transform and content-defined
    # chunking (both reassemble documents — the heavier text shapes)
    "q_doc_span_dedup",
    "q_doc_cdc_chunks",
    # round-4 (cont.): one-scan constraint suite + key-skew profile —
    # the two operational scans a pipeline runs on every batch
    "q_quality_checks",
    "q_events_skew_profile",
    # round-4 session additions: bifurcated skew join, change-feed
    # generation, PQ ANN serving — benched so regressions in the new
    # scale machinery are visible round-over-round
    "q_events_hybrid_join",
    "q_orders_change_feed",
    "q_embedding_pq_topk",
    # round-5: DSIR corpus selection (two corpus scans + broadcast
    # scoring join) — benched so the new selection path stays visible
    "q_doc_dsir_select",
    # round-5: the composed curation pipeline (exact dedup → quality →
    # near-dup canonicalization → domain cap) — the end-to-end flow a
    # training-data user runs; benched as one unit
    "q_corpus_curated",
    # round-5: LSH star-edge cluster assignment — the linear-edge-output
    # near-dup path that stays sub-linear on tools/scale_curve.py's
    # 16x corpora while the pair-emitting family goes quadratic
    "q_doc_star_dedup_clusters",
    # round-5: the same curation funnel on the star backend — the
    # variant a 100 TB run would use (alpha 0.28 vs 2.1, SCALE.md)
    "q_corpus_curated_star",
    # round-5: daily-ingest embedding dedup — batch probes the
    # persistent LSH index at batch cost (flat probe, SCALE.md)
    "q_embedding_incremental_neardup",
    # round-6: linear quality-classifier scoring — the corpus-gate
    # inference pass (one scan, one fixed-width shuffle, broadcast
    # weights); benched so the new classifier path stays visible
    "q_doc_quality_classifier",
    # round-7: IVF-PQ serving with the exact re-rank stage — benched
    # next to q_embedding_pq_topk so the refine lookup's added cost is
    # a visible delta round-over-round
    "q_embedding_ivfpq_refine_topk",
    # round-8 serving/build split (VERDICT r7 #3): the same two query
    # shapes served from the PREBUILT parquet index artifact — the
    # steady-state production numbers; the *_topk twins above keep
    # paying the full rebuild so the pair quantifies build cost
    "q_embedding_pq_serving",
    "q_embedding_ivfpq_refine_serving",
    # round-8: eval-set decontamination (one corpus scan + broadcast
    # gram probe) — benched so the new operator family stays visible
    "q_doc_decontamination_stats",
    # round-8: WordPiece greedy encode over distinct words (one corpus
    # (doc, word) shuffle + the JVM maximal-munch fold) — benched next
    # to q_doc_bpe-family entries so the second tokenizer stays visible
    "q_doc_wordpiece_encode",
    # round-8: hybrid lexical+vector retrieval fused with RRF — one
    # tokenize/count pass + a broadcast-query cosine scan; fusion is
    # metadata-sized
    "q_doc_hybrid_rrf",
    # round-9: unigram-LM (SentencePiece) Viterbi encode — the third
    # tokenizer family, benched next to the BPE/WordPiece entries so
    # the integer-Viterbi fold's cost stays visible round-over-round
    "q_doc_unigram_encode",
    # round-10: SFT/conversation prep — per-conversation BPE token
    # counts split by role (the family's heavy path: turn synthesis,
    # the composite-id token fold, the conv rollup); benched so the
    # new post-training surface stays visible round-over-round
    "q_conv_token_counts",
    # round-11 (VERDICT r10 #7): the full make-the-training-mix
    # composition — curation funnel (star) → decontamination →
    # classifier gate → water-fill token mix → packed bins, reported
    # as per-stage doc/token attrition; benched as ONE unit because
    # that is how a data lead runs it
    "q_corpus_training_mix",
]


def bench_cdc_ingest(spark, sf_dir: str) -> tuple[float, dict]:
    """End-to-end CDC pipeline throughput — the reference's core job.

    The events table is wrapped into Debezium envelopes (JVM-side
    to_json, no Python row work) and pushed through the full batch
    pipeline TWICE: batch 1 (2/3 of events) hits the
    create-on-first-sight path; batch 2 (the rest, a mix of upserts and
    deletes over the SAME keyspace) exercises the real keyed MERGE —
    the reference's central operator. The payload carries a Debezium
    `created_at` timestamp, so the inferred spec partitions the table
    by month and batch 2 runs the partition-pruned rewrite.

    Returns (wall seconds for draining the whole table, per-phase
    breakdown). The breakdown exists because this is the ONLY headline
    entry dominated by tempdir parquet COW writes, so host filesystem
    contention lands on it selectively (r6-r8 driver readings inflated
    while isolated A/Bs showed no code regression). Phases:
      - envelope_force: compute-only cost of building both envelope
        frames (noop sink — no filesystem in the path); untimed in the
        total, pure diagnostic.
      - batch1_create / batch2_merge: the two timed pipeline halves
        (their sum IS the returned total).
      - fs_probe_sec: wall time to rewrite batch-1's lake table
        directory file-for-file (pure driver-local filesystem
        copy, zero Spark) — when the host's disk is the bottleneck
        this inflates with the total; when the code regressed it
        stays flat.
    """
    import json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.cdc.pipeline import CdcEngine, LakeConfig

    e = load_table(spark, sf_dir, "events")
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"field": "event_id", "type": "int64", "optional": False},
                {"field": "user_id", "type": "int64", "optional": True},
                {"field": "event_type", "type": "string", "optional": True},
                {"field": "value", "type": "float64", "optional": True},
                {
                    "field": "created_at",
                    "type": "int64",
                    "optional": False,
                    "name": "io.debezium.time.timestamp",
                },
            ],
        }
    )

    def envelope(df):
        return df.select(
            F.concat(
                F.lit('{"event_id": '), F.col("event_id").cast("string"),
                F.lit("}"),
            ).alias("key"),
            F.concat(
                F.lit('{"schema": ' + schema_json + ', "payload": '),
                F.to_json(
                    F.struct(
                        "event_id", "user_id", "event_type", "value",
                        F.unix_millis("ts").alias("created_at"),
                    )
                ),
                F.lit("}"),
            ).alias("value"),
            F.lit("source_glaucus1.oms1.events_cdc").alias("__topic"),
            F.lit("events_cdc").alias("__table"),
            F.when(F.col("event_type") == "error", "d")
            .otherwise("u")
            .alias("__op"),
            F.unix_millis("ts").alias("__ts_ms"),
            F.lit("oms1").alias("__db"),
        )

    batch1 = envelope(e.filter(F.col("event_id") % 3 != 0))
    batch2 = envelope(e.filter(F.col("event_id") % 3 == 0))
    lake = tempfile.mkdtemp(prefix="bench-cdc-")
    engine = CdcEngine(spark, LakeConfig(root=lake))
    phases: dict[str, float] = {}
    t0 = time.perf_counter()
    batch1.write.format("noop").mode("overwrite").save()
    batch2.write.format("noop").mode("overwrite").save()
    phases["envelope_force"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    engine.process_batch(batch1)  # create path
    t1 = time.perf_counter()
    phases["batch1_create"] = round(t1 - t0, 3)
    engine.process_batch(batch2)  # partition-pruned keyed MERGE
    t2 = time.perf_counter()
    phases["batch2_merge"] = round(t2 - t1, 3)
    dt = t2 - t0
    # pure-filesystem probe: copy the lake's parquet files byte-for-byte
    # with no Spark in the loop. Inflates with host disk contention,
    # flat on code regressions — the attribution signal.
    t0 = time.perf_counter()
    probe = f"{lake}-fsprobe"
    shutil.copytree(lake, probe)
    phases["fs_probe_sec"] = round(time.perf_counter() - t0, 3)
    shutil.rmtree(probe, ignore_errors=True)
    shutil.rmtree(lake, ignore_errors=True)
    return round(dt, 3), phases


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# ---------------------------------------------------------------------------
# Per-phase attribution probes (VERDICT r9 #1): the three entries whose
# driver readings drifted with UNCHANGED plans get the cdc treatment —
# one untimed diagnostic pass each, decomposed into pipeline stages, so
# a future inflated reading self-attributes from the artifact alone
# (scan-bound: the feature/shingle stage inflates too; join/serve-bound:
# only the total moves; host-wide: host_probe_sec moves with everything).
# ---------------------------------------------------------------------------


def phases_dsir(spark, sf_dir: str) -> dict[str, float]:
    """q_doc_dsir_select stages: the target tokenize+hash scan, the
    corpus tokenize+hash scan (the two dominant scans), then the full
    select (adds the distribution aggs, two broadcast scoring joins,
    Gumbel top-k)."""
    from pyspark.sql import functions as F

    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.dsir import hashed_ngram_buckets
    from data_engineering_spark.queries import QUERIES

    ph: dict[str, float] = {}
    d = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    _noop(hashed_ngram_buckets(
        d.filter(F.col("source") == "src1"), "doc_id", "text", 8192
    ))
    ph["target_features"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _noop(hashed_ngram_buckets(d, "doc_id", "text", 8192))
    ph["corpus_features"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _noop(QUERIES["q_doc_dsir_select"](spark, sf_dir))
    ph["select_total"] = round(time.perf_counter() - t0, 3)
    return ph


def phases_pq(spark, sf_dir: str) -> dict[str, float]:
    """q_embedding_pq_topk stages: driver-side codebook training
    (sample collect + k-means), corpus encode, and the ADC serve scan
    against a pre-materialized encoded frame."""
    from pyspark.sql import functions as F

    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.pq import pq_encode, pq_topk
    from data_engineering_spark.queries.similarity import (
        _K,
        _TOPK_QUERIES,
        _pq_codebooks_spark,
    )

    ph: dict[str, float] = {}
    e = load_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    cb = _pq_codebooks_spark(spark, e)
    ph["codebook_train"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _noop(pq_encode(e, cb))
    ph["encode"] = round(time.perf_counter() - t0, 3)
    enc = pq_encode(e, cb).persist()
    enc.count()
    q = e.filter(F.col("vec_id") < _TOPK_QUERIES)
    t0 = time.perf_counter()
    _noop(pq_topk(enc, cb, q, k=_K))
    ph["serve"] = round(time.perf_counter() - t0, 3)
    enc.unpersist()
    return ph


def phases_star(spark, sf_dir: str) -> dict[str, float]:
    """q_doc_star_dedup_clusters stages: shingle sets + band rows (the
    corpus scan, materializes the shared persist), star edges (bucket
    min-agg + join, reuses the persist), then the full query (adds
    exact verify + pointer-jumping CC)."""
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.minhash import (
        _shingle_sets_and_bands,
        star_edges,
    )
    from data_engineering_spark.queries import QUERIES

    ph: dict[str, float] = {}
    d = load_table(spark, sf_dir, "documents")
    docsets, bands = _shingle_sets_and_bands(
        d, "doc_id", "text", 3, 64, 32
    )
    t0 = time.perf_counter()
    _noop(bands)
    ph["bands"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _noop(star_edges(bands))
    ph["edges"] = round(time.perf_counter() - t0, 3)
    docsets.unpersist()
    t0 = time.perf_counter()
    _noop(QUERIES["q_doc_star_dedup_clusters"](spark, sf_dir))
    ph["clusters_total"] = round(time.perf_counter() - t0, 3)
    return ph


def phases_clusters(spark, sf_dir: str) -> dict[str, float]:
    """q_doc_dedup_clusters stages (VERDICT r10 #2, the 3.4x driver
    drift with an untouched plan): exact-jaccard pair generation (the
    prefix-filter join — materializes the inv0/cands persists), CC
    min-label propagation over the warm pairs, then a SECOND full
    query run — the carry check: the query deliberately relies on
    session-carried persists (queries/llm_filters.py), so full_warm
    far above cc_total means the carry did not engage (the r10
    reading's hypothesized mode), while a uniformly slow pairs phase
    points at the corpus scan instead."""
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.graph import dedup_clusters
    from data_engineering_spark.operators.text import (
        ngram_jaccard_pairs,
    )
    from data_engineering_spark.queries import QUERIES

    ph: dict[str, float] = {}
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.6)
    t0 = time.perf_counter()
    _noop(pairs)
    ph["pairs"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _noop(dedup_clusters(pairs))
    ph["cc_total"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _noop(QUERIES["q_doc_dedup_clusters"](spark, sf_dir))
    ph["full_warm"] = round(time.perf_counter() - t0, 3)
    return ph


def phases_rrf(spark, sf_dir: str) -> dict[str, float]:
    """q_doc_hybrid_rrf stages (VERDICT r11 #7): the lexical leg's
    (doc, term) tf pass, the full lexical coordination ranking, the
    exact-cosine vector leg, then the full fused query. The two legs
    are independent single-pass subtrees that overlap inside the one
    fused action, so full ≈ max(legs) + fuse is the at-floor
    signature; full >> legs means the fusion re-executed a leg."""
    from pyspark.sql import functions as F

    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.fusion import (
        coordination_rank,
    )
    from data_engineering_spark.operators.similarity import cosine_topk
    from data_engineering_spark.operators.text import tokens
    from data_engineering_spark.queries import QUERIES

    ph: dict[str, float] = {}
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    words = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    t0 = time.perf_counter()
    _noop(tf)
    ph["tf_pass"] = round(time.perf_counter() - t0, 3)
    qterms = (
        words.filter(F.col("doc_id").isin(0, 1, 2, 3))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    t0 = time.perf_counter()
    _noop(coordination_rank(tf, qterms, topk=20))
    ph["lex_leg"] = round(time.perf_counter() - t0, 3)
    qvecs = e.filter(F.col("vec_id").isin(0, 1, 2, 3)).limit(4)
    t0 = time.perf_counter()
    _noop(cosine_topk(e, qvecs, k=20))
    ph["vec_leg"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _noop(QUERIES["q_doc_hybrid_rrf"](spark, sf_dir))
    ph["full"] = round(time.perf_counter() - t0, 3)
    return ph


PHASE_PROBES = {
    "q_doc_dsir_select": phases_dsir,
    "q_embedding_pq_topk": phases_pq,
    "q_doc_star_dedup_clusters": phases_star,
    "q_doc_dedup_clusters": phases_clusters,
    "q_doc_hybrid_rrf": phases_rrf,
}


def bench_bucketed_join(spark, sf_dir: str) -> float:
    """The SCALE.md bucketing claim, measured: lineitem ⋈ orders on
    orderkey with BOTH tables bucketed on the key reads co-located
    buckets and plans with ZERO Exchange (asserted here, not assumed —
    the shuffle this removes is the dominant one at 100 TB). Setup
    (bucketed table writes) is untimed: it is the ingest-time cost the
    lake pays once, amortized over every downstream join."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.plans.explain import plan_string
    from data_engineering_spark.sources.lake_writer import (
        write_bucketed_table,
    )

    wh = tempfile.mkdtemp(prefix="bench-bucketed-")
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem"),
        "bench_b_lineitem", "l_orderkey", num_buckets=16,
        path=f"{wh}/lineitem",
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "orders"),
        "bench_b_orders", "o_orderkey", num_buckets=16,
        path=f"{wh}/orders",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def q():
            l = spark.table("bench_b_lineitem")
            o = spark.table("bench_b_orders")
            # per-order revenue: the groupBy key IS the bucket key, so
            # join AND aggregation both run on co-located buckets —
            # the whole plan is Exchange-free
            return (
                l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("l_orderkey", "o_orderstatus")
                .agg(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,2)")
                    ).alias("rev")
                )
            )

        assert "Exchange" not in plan_string(q().limit(1)), (
            "bucketed join must plan shuffle-free"
        )
        q().write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            q().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bench_b_lineitem")
        spark.sql("DROP TABLE IF EXISTS bench_b_orders")
        shutil.rmtree(wh, ignore_errors=True)
    return round(best, 3)


def _cpu_ticks() -> tuple[int, int] | None:
    """(steal, total) jiffies from /proc/stat — the hypervisor-steal
    attribution signal. The end-of-run host probe is a point sample
    and provably misses mid-run steal BURSTS (observed: a quiet probe
    reading next to 2-4x inflated samples while the cumulative steal
    counter had jumped); the run-wide steal delta catches them."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ticks0 = _cpu_ticks()
    spark = get_session(app_name="data-engineering-spark-bench")

    # JVM/codegen warmup so the timed runs measure steady-state query
    # execution, not one-time Janino compilation + JIT of each query
    # shape (measured 3-8 s per shape, ~60% of total cold wall — a cost
    # that is irrelevant at 100 TB where it amortizes to nothing). Each
    # headline query runs once against a SMALLER scale factor (sf0.01:
    # close enough in size that AQE picks the same plan variants, so the
    # compiled classes match), but a different data directory, so no
    # data/file-index reuse flatters the timed run.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass  # warmup is best-effort; the timed run will surface errors

    # best-of-2 per query: the first sf0.1 execution can still compile
    # AQE-chosen plan variants the smaller warmup didn't trigger; the
    # better of two runs is the steady-state number a pipeline sees.
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    # entries with a documented noisy driver history (VERDICT r8 #8)
    # always take a third sample so drift-vs-regression arguments are
    # settled by data, not re-runs
    noisy = {
        "q_corpus_curated_star",
        # r9 driver drift with unchanged plans (VERDICT r10 watch list):
        # three samples each until their bands re-pin
        "q_doc_dsir_select",
        "q_embedding_pq_topk",
        "q_doc_star_dedup_clusters",
        # r10 driver drift with unchanged plans (VERDICT r10 #2):
        # dedup_clusters historically reaches steady state only at
        # sample 3 (r8: 17.9/4.7/1.9; r9: 6.2/2.1/1.84) — two equally
        # cold samples can't trip the stall guard; gopher rides along
        # as the same-round watch entry
        "q_doc_dedup_clusters",
        "q_doc_gopher_filters",
        # r11: the training-mix composition shares the funnel/star
        # machinery above (same session-carry profile — sample 1 pays
        # every persist/JIT; steady state appears at sample 2-3) and
        # runs LAST, where long-JVM inflation lands hardest
        "q_corpus_training_mix",
    }
    for name in HEADLINE:
        fn = QUERIES[name]
        runs: list[float] = []
        for _ in range(3 if name in noisy else 2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        # stall guard: when the two runs disagree by >2x, at least one
        # hit a JIT/GC/host stall (the documented environmental
        # pattern — identical commits have read 4-5x apart); one more
        # sample tightens the min-estimator without changing its
        # meaning. Steady queries still pay exactly 2 runs.
        if max(runs) > 2 * min(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        # ALL raw samples go into the artifact (r6 verdict item 2): a
        # driver-vs-clean-host disagreement is then diagnosable from
        # the json alone — a stalled sample shows up as one outlier
        # run, not as an unexplained min.
        samples[name] = [round(r, 3) for r in runs]
        # the near-dup/span operators persist shared subtrees and the
        # CC loop localCheckpoints per round; across 2×N timed runs
        # those blocks accumulate until the block manager thrashes
        # (measured: random multi-second stalls late in the bench).
        # clearCache drops catalog-tracked caches; the JVM GC nudge
        # runs the ContextCleaner, which is what actually frees
        # checkpoint/broadcast blocks whose Python references are gone.
        # Each query still builds and uses its own cache INSIDE its
        # timed runs — this only removes cross-query interference.
        spark.catalog.clearCache()
        # Python GC FIRST: py4j releases its JVM-side references only
        # when the Python proxies are finalized, and the ContextCleaner
        # can't free checkpoint blocks that py4j still pins — without
        # this, the System.gc() below has nothing to collect
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    bench_cdc_ingest(spark, warm_dir)  # warm the CDC pipeline shapes too
    # best-of-3 (VERDICT r8 #1/#8: three consecutive rounds of inflated
    # driver readings on this one entry), with a per-phase breakdown per
    # sample so an inflated reading is attributable from the artifact
    # alone: code regressions move batch1/batch2 uniformly; host disk
    # contention moves fs_probe_sec with them.
    cdc_runs: list[float] = []
    cdc_phases: list[dict] = []
    for _ in range(3):
        dt, ph = bench_cdc_ingest(spark, sf_dir)
        cdc_runs.append(dt)
        cdc_phases.append(ph)
    timings["cdc_ingest_pipeline"] = min(cdc_runs)
    samples["cdc_ingest_pipeline"] = cdc_runs
    # untimed per-phase diagnostic passes for the drift-prone entries
    # (VERDICT r9 #1) — not part of the headline total
    all_phases: dict[str, object] = {"cdc_ingest_pipeline": cdc_phases}
    for name, probe in PHASE_PROBES.items():
        try:
            all_phases[name] = probe(spark, sf_dir)
        except Exception as ex:  # a broken probe must not sink the bench
            all_phases[name] = {"error": repr(ex)[:120]}
        spark.catalog.clearCache()
    # VERDICT r4 #7: the bucketed fact-fact join, benched (plan is
    # assert-checked Exchange-free inside)
    timings["bucketed_orderkey_join"] = bench_bucketed_join(spark, sf_dir)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # host-contention reading for the whole artifact: the same fixed
    # CPU workload the bench guard uses (tests/_host_probe) — a loaded
    # host inflates this alongside every query; a plan regression
    # doesn't. Nominal idle on this box: ~0.05 s.
    try:
        from tests._host_probe import probe_sec

        host_probe = round(probe_sec(), 4)
    except Exception:
        host_probe = None
    # run-wide hypervisor-steal share: % of this run's CPU jiffies
    # stolen by co-tenants. 0 on a quiet host; an inflated artifact
    # with steal_pct > ~1 is environmental, not a code regression.
    ticks1 = _cpu_ticks()
    steal_pct = None
    if ticks0 and ticks1 and ticks1[1] > ticks0[1]:
        steal_pct = round(
            100.0 * (ticks1[0] - ticks0[0]) / (ticks1[1] - ticks0[1]), 3
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "samples": samples,
                "phases": all_phases,
                "host_probe_sec": host_probe,
                "steal_pct": steal_pct,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
