"""Mega-bucket straggler probe for the LSH similarity join.

The weak-scaling dupes curve (SCALE.md) shows the clique CORPUS —
many medium buckets — where triangle tiling is pure overhead (no
bucket exceeds any sane cap; max bucket 463 at x64). This probe
measures the OTHER corpus shape, the one tiling exists for: one
boilerplate mega-clique whose members co-bucket in every band, so the
untiled bucket-local scorer collapses to `num_bands` tasks — at
cluster scale a 10^6-row bucket is a multi-hour single task no matter
how many executors sit idle.

Fixture: CLIQUE_N near-identical vectors (jitter sized so pairwise
cosine sits BELOW the threshold — the bucket is a hash collision mass,
not an output explosion) plus a random background. Timed cold
(cache cleared between reps), untiled vs tiled.

    python tools/clique_probe.py            # defaults: 64k clique
    CLIQUE_N=32768 CAP=4096 python tools/clique_probe.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from data_engineering_spark.operators.similarity import (  # noqa: E402
    lsh_bucketed_similarity_join,
)
from data_engineering_spark.session import get_session  # noqa: E402

CLIQUE_N = int(os.environ.get("CLIQUE_N", "65536"))
BACKGROUND_N = int(os.environ.get("BACKGROUND_N", "16384"))
CAP = int(os.environ.get("CAP", "4096"))
DIM = 64
BANDS, PLANES = 4, 12  # few bands: the untiled task count IS the bands


def build(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal(DIM)
    base /= np.linalg.norm(base)
    # per-dim jitter 0.0125 -> |noise|^2 ~ 0.01: member-member cosine
    # ~0.990 (under the 0.995 threshold, so the clique is GEMM mass,
    # not emitted pairs) while ~3/4 of members share the base's bucket
    # in every band — the boilerplate mega-bucket
    clique = base[None, :] + 0.0125 * rng.standard_normal(
        (CLIQUE_N, DIM)
    )
    bg = rng.standard_normal((BACKGROUND_N, DIM))
    vecs = np.concatenate([clique, bg])
    pdf = {
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": list(vecs),
    }
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(pdf))
    out = f"/tmp/spark_graft_clique_{CLIQUE_N}"
    if not os.path.exists(out):
        df.write.mode("overwrite").parquet(out)
    return out


def timed(spark, path, cap):
    df = spark.read.parquet(path)
    j = lsh_bucketed_similarity_join(
        df,
        threshold=0.995,
        num_bands=BANDS,
        planes_per_band=PLANES,
        max_bucket_rows=cap,
    )
    t0 = time.perf_counter()
    j.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    return dt


def main() -> None:
    spark = get_session(app_name="clique-probe")
    path = build(spark)
    # codegen warmup on a slice, then cold reps
    warm = spark.read.parquet(path).limit(2000)
    lsh_bucketed_similarity_join(
        warm, threshold=0.995, num_bands=BANDS, planes_per_band=PLANES,
        max_bucket_rows=CAP,
    ).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    res = {}
    for label, cap in (("untiled", None), (f"tiled_cap{CAP}", CAP)):
        res[label] = [round(timed(spark, path, cap), 2) for _ in range(2)]
    print(
        json.dumps(
            {
                "clique_n": CLIQUE_N,
                "background_n": BACKGROUND_N,
                "bands": BANDS,
                "planes": PLANES,
                "cap": CAP,
                "cold_secs": res,
            }
        )
    )


if __name__ == "__main__":
    main()
