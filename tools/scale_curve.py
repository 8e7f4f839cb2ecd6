"""Weak-scaling curve for the flagship corpus operators.

The correctness gate runs at sf0.01/sf0.1; this tool answers the OTHER
question the engine is designed around: how does runtime grow as the
corpus grows? It replicates the documents table at 1x/4x/16x (env
`SCALE_STEPS` to override, e.g. "1,4,16,64") and times each flagship
operator at every scale, reporting the per-step scaling exponent
    alpha = log(t_big / t_small) / log(scale_big / scale_small)
— alpha ~= 1.0 is linear (the 100 TB-safe shape), alpha >= 1.5 means
the operator has a super-linear term that WILL bite at cluster scale.

Replica construction (deterministic, Spark-side, no driver loops):
doc_id is remapped to `doc_id + k * (max_id + 1)` so ids stay unique;
lang/source are preserved; n_chars is recomputed from the new text.
Two modes (`SCALE_MODE`), because they measure DIFFERENT hazards:

- `distinct` (default): replica k > 0 sorts each document's words by
  xxhash64(word, position, k) — a per-doc pseudorandom permutation, so
  replicas share essentially no word n-gram shingles. This measures
  how the operators grow on a corpus of genuinely distinct documents
  (the candidate-generation / shuffle / window terms).
- `dupes`: replica k rotates the word list by a k-dependent offset.
  Rotation preserves almost every adjacent n-gram, so every replica is
  a near-duplicate of its original: at 16x each document sits in a
  16-clique and any operator that EMITS all qualifying pairs pays the
  inherent O(sum cluster^2) output term. This is the duplicate-heavy
  crawl shape (boilerplate clusters), kept deliberately as the
  adversarial curve.

Run on an otherwise idle machine (same rule as bench.py):

    python tools/scale_curve.py                 # distinct, 1x/4x/16x
    SCALE_MODE=dupes python tools/scale_curve.py
    SCALE_STEPS=1,4 python tools/scale_curve.py

Prints one human table plus one machine-readable JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_spark.catalog import load_table  # noqa: E402
from data_engineering_spark.queries import QUERIES  # noqa: E402
from data_engineering_spark.session import get_session  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MODE = os.environ.get("SCALE_MODE", "distinct")
_TAG = (
    MODE
    if os.environ.get("SCALE_TABLE", "documents") == "documents"
    else os.environ["SCALE_TABLE"]
    + ("_dupes" if MODE == "dupes" else "")
)
OUT_ROOT = f"/tmp/spark_graft_scale_{_TAG}"
STEPS = [int(s) for s in os.environ.get("SCALE_STEPS", "1,4,16").split(",")]

# the operators whose 100 TB story SCALE.md argues. TABLE=documents
# (default) covers the corpus operators; TABLE=events covers the
# events/window core (replicas add new users with identical per-user
# histories — weak scaling by user population, the natural growth
# axis). Each scaled dir carries only its one table.
TABLE = os.environ.get("SCALE_TABLE", "documents")
def _neardup_lsh(spark, d):
    from data_engineering_spark.operators.similarity import (
        lsh_bucketed_similarity_join,
    )

    e = load_table(spark, d, "embeddings")
    return lsh_bucketed_similarity_join(
        e, threshold=0.9, num_bands=12, planes_per_band=12
    )


def _neardup_lsh_tiled(spark, d):
    # same plan, per-task GEMM capped: over-cap buckets triangle-tile
    # into bounded parallel tasks (the clique-straggler mitigation)
    from data_engineering_spark.operators.similarity import (
        lsh_bucketed_similarity_join,
    )

    e = load_table(spark, d, "embeddings")
    return lsh_bucketed_similarity_join(
        e, threshold=0.9, num_bands=12, planes_per_band=12,
        max_bucket_rows=2048,
    )


def _neardup_exact(spark, d):
    from data_engineering_spark.operators.similarity import (
        cosine_similarity_join,
    )

    e = load_table(spark, d, "embeddings")
    return cosine_similarity_join(e, 0.9)


# curve-only probes at the near-dup operating point (threshold 0.9,
# 12x12 banding: ~4096-way buckets, detection ~1.0 at the clique
# cosine ~0.995) — the registered q_embedding_lsh_join is pinned to
# the oracle-checkable threshold 0.4, so the high-threshold regime is
# exercised here instead
EXTRA_QUERIES = {
    "x_embedding_lsh_neardup_t09": _neardup_lsh,
    "x_embedding_lsh_neardup_t09_tiled": _neardup_lsh_tiled,
    "x_embedding_exact_join_t09": _neardup_exact,
}

FLAGSHIP = {
    "embeddings_dupes": [
        # duplicate-heavy corpus (perturbed replicas form scale-sized
        # cliques at cosine ~0.995): the exact join pays n^2 GEMM
        # flops regardless of output; banded LSH pays bucket mass.
        # This is the crossover the near-dup path exists for.
        # the _tiled variant is NOT in the default list: its persisted
        # banding survives between this harness's best-of-2 reps
        # (CacheManager matches the identical plan), which flatters it
        # vs the untiled row. tools/clique_probe.py is the canonical
        # tiling measurement (cold reps, cache cleared between runs);
        # opt in here via SCALE_QUERIES for the machinery-premium
        # number only.
        "x_embedding_lsh_neardup_t09",
        "x_embedding_exact_join_t09",
    ],
    "embeddings": [
        # fixed 8-query serving set over a growing corpus — the ANN
        # serving shape. similarity_join is the exact all-pairs
        # BASELINE and is quadratic by design (kept to show it);
        # the serving paths must stay ~linear.
        "q_cosine_topk",
        "q_embedding_similarity_join",
        "q_embedding_pq_topk",
        "q_embedding_ivf_topk",
        "q_embedding_lsh_join",
        "q_embedding_incremental_neardup",
    ],
    "documents": [
        "q_doc_dedup_exact",
        "q_doc_gopher_filters",
        "q_doc_ngram_jaccard_pairs",
        "q_doc_minhash_neardup",
        "q_doc_dedup_clusters",
        "q_doc_star_dedup_clusters",
        "q_doc_dsir_select",
        "q_corpus_curated",
        "q_corpus_curated_star",
        # round-6: classifier scoring and BPE counting must stay ~linear
        # (one fixed-width shuffle each after the scan)
        "q_doc_quality_classifier",
        "q_doc_bpe_top_pairs",
    ],
    "events": [
        "q_events_keep_last_per_user",
        "q_events_sessionize",
        "q_events_tumbling_window",
        "q_events_skew_profile",
        "q_events_dau_wau_mau",
        "q_events_funnel",
        "q_events_transitions",
    ],
}[TABLE + "_dupes" if TABLE == "embeddings" and MODE == "dupes" else TABLE]
if os.environ.get("SCALE_QUERIES"):
    FLAGSHIP = os.environ["SCALE_QUERIES"].split(",")


def build_scaled_events(spark, scale: int) -> str:
    """Replica k: event_id/user_id shifted past the originals — k-fold
    more users, each with the original per-user history (ts untouched:
    same window, denser traffic — the realistic growth axis for the
    window/sessionize family). MODE does not apply to events."""
    out = os.path.join(OUT_ROOT, f"x{scale}")
    dst = os.path.join(out, "events.parquet")
    if os.path.exists(dst):
        return out
    # write plain TIMESTAMP_MICROS: the default INT96 output becomes
    # timestamp[ns] when pyarrow coalesces the part-files, and an
    # adjusted-to-UTC nanos column is exactly the shape load_table's
    # nanosAsLong compatibility path does not cover
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    ev = load_table(spark, BASE_SF, "events")
    top = ev.agg(F.max("event_id"), F.max("user_id")).collect()[0]
    max_e, max_u = top[0], top[1]
    reps = []
    for k in range(scale):
        reps.append(
            ev.withColumn(
                "event_id", F.col("event_id") + F.lit(k * (max_e + 1))
            ).withColumn(
                "user_id", F.col("user_id") + F.lit(k * (max_u + 1))
            )
        )
    united = reps[0]
    for r in reps[1:]:
        united = united.unionByName(r)
    os.makedirs(out, exist_ok=True)
    tmp = dst + "_dir"
    united.repartition(max(1, scale)).write.mode("overwrite").parquet(tmp)
    import pyarrow.parquet as pq

    pq.write_table(pq.read_table(tmp), dst)
    shutil.rmtree(tmp)
    return out


def build_scaled_embeddings(spark, scale: int) -> str:
    """Replica k: vec_id shifted past the originals; the embedding is
    rotated k dimensions (norm-preserving, decorrelates direction), so
    the corpus grows with distinct vectors while the fixed query set
    (vec_id < 8, replica 0) stays put — the serving shape."""
    out = os.path.join(OUT_ROOT, f"x{scale}")
    dst = os.path.join(out, "embeddings.parquet")
    if os.path.exists(dst):
        return out
    e = load_table(spark, BASE_SF, "embeddings")
    max_id = e.agg(F.max("vec_id")).collect()[0][0]
    reps = []
    for k in range(scale):
        r = e.withColumn("vec_id", F.col("vec_id") + F.lit(k * (max_id + 1)))
        if k > 0:
            if MODE == "dupes":
                # per-dim multiplicative jitter in [0.96, 1.04]
                # (deterministic in (dim, k)): the replica stays a
                # near-duplicate of its base (cosine ~0.995), so each
                # base vector becomes a scale-sized clique — the
                # boilerplate-crawl shape for the embedding space
                mult = k * 41 + 13
                r = r.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, i) -> x * (1.0d"
                        f" + 0.04d * (pmod((i + 1) * {mult}, 19) - 9.0d)"
                        " / 9.0d))"
                    ),
                )
            else:
                v = F.col("embedding")
                rot = F.lit(k % 64)
                r = r.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(v, rot + 1, F.size(v) - rot),
                        F.slice(v, F.lit(1), rot),
                    ),
                )
        reps.append(r)
    united = reps[0]
    for r in reps[1:]:
        united = united.unionByName(r)
    os.makedirs(out, exist_ok=True)
    tmp = dst + "_dir"
    united.repartition(max(1, scale)).write.mode("overwrite").parquet(tmp)
    import pyarrow.parquet as pq

    pq.write_table(pq.read_table(tmp), dst)
    shutil.rmtree(tmp)
    return out


def build_scaled(spark, scale: int) -> str:
    if TABLE == "events":
        return build_scaled_events(spark, scale)
    if TABLE == "embeddings":
        return build_scaled_embeddings(spark, scale)
    out = os.path.join(OUT_ROOT, f"x{scale}")
    dst = os.path.join(out, "documents.parquet")
    if os.path.exists(dst):
        return out
    docs = load_table(spark, BASE_SF, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    reps = []
    for k in range(scale):
        r = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * (max_id + 1))
        )
        if k > 0:
            if MODE == "dupes":
                # rotation: keeps nearly every adjacent n-gram — the
                # replica IS a near-duplicate (clique-growth curve)
                w = F.split(F.col("text"), " ")
                rot = F.lit(1) + F.pmod(
                    F.lit(k * 7), F.greatest(F.size(w) - 1, F.lit(1))
                )
                new_text = F.array_join(
                    F.concat(
                        F.slice(w, rot + 1, F.size(w) - rot),
                        F.slice(w, F.lit(1), rot),
                    ),
                    " ",
                )
            else:
                # per-doc pseudorandom word permutation: destroys all
                # adjacency, so replicas share ~no shingles with their
                # original or with each other (distinct-corpus curve)
                new_text = F.expr(
                    "array_join(transform(array_sort(transform("
                    "  split(text, ' '), (x, i) -> "
                    f" struct(xxhash64(x, i, {k}) AS h, x AS w))), "
                    " s -> s.w), ' ')"
                )
            r = r.withColumn("text", new_text).withColumn(
                "n_chars", F.length("text").cast("long")
            )
        reps.append(r)
    united = reps[0]
    for r in reps[1:]:
        united = united.unionByName(r)
    os.makedirs(out, exist_ok=True)
    tmp = dst + "_dir"
    united.repartition(max(1, scale)).write.mode("overwrite").parquet(tmp)
    # queries expect a single documents.parquet path; coalesce the
    # part-files into one (duckdb + load_table both read a file path)
    import pyarrow.parquet as pq

    pq.write_table(pq.read_table(tmp), dst)
    shutil.rmtree(tmp)
    return out


def _resolve(name):
    return EXTRA_QUERIES.get(name) or QUERIES[name]


def main() -> None:
    spark = get_session(app_name="scale-curve")
    dirs = {s: build_scaled(spark, s) for s in STEPS}
    # codegen warmup per query shape on the smallest scale
    for name in FLAGSHIP:
        _resolve(name)(spark, dirs[STEPS[0]]).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
    results: dict[str, dict[int, float]] = {n: {} for n in FLAGSHIP}
    for scale in STEPS:
        for name in FLAGSHIP:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _resolve(name)(spark, dirs[scale]).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            results[name][scale] = round(best, 3)
            # same inter-query hygiene as bench.py: catalog caches,
            # then Python GC (py4j must drop its JVM refs), then a JVM
            # GC nudge so the ContextCleaner frees checkpoint blocks —
            # measured 1.4-1.7x inflation of later x16 queries without
            # this (cross-query block-manager pressure)
            import gc

            spark.catalog.clearCache()
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
    header = ["query"] + [f"x{s}" for s in STEPS] + [
        f"alpha[{a}->{b}]" for a, b in zip(STEPS, STEPS[1:])
    ]
    print("\t".join(header))
    alphas: dict[str, list[float]] = {}
    for name in FLAGSHIP:
        row = [name] + [f"{results[name][s]:.3f}" for s in STEPS]
        al = []
        for a, b in zip(STEPS, STEPS[1:]):
            al.append(
                round(
                    math.log(results[name][b] / results[name][a])
                    / math.log(b / a),
                    2,
                )
            )
        alphas[name] = al
        print("\t".join(row + [str(x) for x in al]))
    print(
        json.dumps(
            {
                "base_sf": BASE_SF,
                "mode": MODE,
                "steps": STEPS,
                "secs": {n: results[n] for n in FLAGSHIP},
                "alpha": alphas,
            }
        )
    )


if __name__ == "__main__":
    main()
