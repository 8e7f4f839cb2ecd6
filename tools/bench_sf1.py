"""One-shot compute-bound validation bench (VERDICT r11 #2).

Runs the heavy bench entries against the 10x directory built by
tools/build_sf1.py, at local[$SPARK_GRAFT_CPUS] — run it once at 32
and once at 8 cores and compare: ratios (t_8c / t_32c) > 1 prove the
operators parallelize when exchanges carry real bytes (at sf0.1 the
whole bench is scheduler-bound and the ratio sits at or below 1.0 —
BENCH_r11_c8). Same methodology as bench.py: sf0.1 warmup per shape,
best-of-2, noop sink, run-wide steal_pct in the artifact.

    SPARK_GRAFT_CPUS=32 python tools/bench_sf1.py > BENCH_sf1_c32.json
    SPARK_GRAFT_CPUS=8  python tools/bench_sf1.py > BENCH_sf1_c8.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_ticks, bench_cdc_ingest  # noqa: E402
from data_engineering_spark.queries import QUERIES  # noqa: E402
from data_engineering_spark.session import get_session  # noqa: E402

SF1 = os.environ.get("SF1_DIR", "/tmp/spark_graft_sf1")
WARM = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# the six heaviest entries (VERDICT r11 #2's list)
ENTRIES = os.environ.get(
    "SF1_QUERIES",
    "q_corpus_training_mix,q_corpus_curated_star,"
    "q_doc_star_dedup_clusters,q_embedding_pq_topk,"
    "q_doc_minhash_neardup,cdc_ingest_pipeline",
).split(",")


def main() -> None:
    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run tools/build_sf1.py first")
    ticks0 = _cpu_ticks()
    spark = get_session(app_name="bench-sf1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in ENTRIES:
        if name == "cdc_ingest_pipeline":
            bench_cdc_ingest(spark, WARM)  # shape warmup
            runs = []
            for _ in range(2):
                dt, _ph = bench_cdc_ingest(spark, SF1)
                runs.append(dt)
        else:
            fn = QUERIES[name]
            try:
                fn(spark, WARM).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, SF1).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs)
        samples[name] = runs
        spark.catalog.clearCache()
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    ticks1 = _cpu_ticks()
    steal = None
    if ticks0 and ticks1 and ticks1[1] > ticks0[1]:
        steal = round(
            100.0 * (ticks1[0] - ticks0[0]) / (ticks1[1] - ticks0[1]), 3
        )
    print(
        json.dumps(
            {
                "metric": "sf1_heavy_entries_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "samples": samples,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                "steal_pct": steal,
                "sf": "sf1(10x sf0.1, tools/build_sf1.py)",
            }
        )
    )


if __name__ == "__main__":
    main()
