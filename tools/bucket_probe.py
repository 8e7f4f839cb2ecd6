"""Merge-cost probe for the hidden key-hash bucket layout.

Measures the claim behind ``MergeTable(bucket_by=N)`` (SCALE.md known
limits): an unpartitioned keyed COW table pays a full-table rewrite per
merge, while the synthetic ``bucket(N, key)`` layout rewrites only the
buckets the batch's keys hash into — so small-batch merge cost tracks
the batch's bucket fan-out, not table size.

Fixture: a keyed table of ``TABLE_N`` rows, then ``ROUNDS`` update
batches of ``BATCH_KEYS`` random existing keys each, applied to (a) the
flat layout and (b) ``bucket_by=BUCKETS``. Final states are compared
for equality (the layouts must be semantically invisible). Cache is
cleared between rounds; per-merge wall times are reported raw so the
warmup curve is visible (bench-methodology policy: no silent best-of).

    python tools/bucket_probe.py
    TABLE_N=2000000 BATCH_KEYS=64 BUCKETS=256 python tools/bucket_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_spark.operators.merge import MergeTable  # noqa: E402
from data_engineering_spark.session import get_session  # noqa: E402

TABLE_N = int(os.environ.get("TABLE_N", "1000000"))
BATCH_KEYS = int(os.environ.get("BATCH_KEYS", "32"))
BUCKETS = int(os.environ.get("BUCKETS", "256"))
ROUNDS = int(os.environ.get("ROUNDS", "5"))


def base_frame(spark):
    return spark.range(TABLE_N).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("int").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        F.lit(0).cast("long").alias("__ts_ms"),
    )


def batch_frame(spark, round_no: int):
    # deterministic pseudo-random existing keys, disjoint across rounds
    return (
        spark.range(BATCH_KEYS)
        .select(
            F.pmod(
                F.xxhash64(F.col("id") + F.lit(round_no * 100_003)),
                F.lit(TABLE_N),
            ).alias("k")
        )
        .distinct()
        .select(
            "k",
            F.lit(round_no).cast("int").alias("v"),
            F.concat(F.lit("upd"), F.col("k")).alias("payload"),
            F.lit(round_no + 1).cast("long").alias("__ts_ms"),
            F.lit("u").alias("__op"),
        )
    )


def run(spark, workdir: str, bucket_by: int | None) -> dict:
    path = os.path.join(workdir, f"t_{bucket_by or 'flat'}")
    t = MergeTable(spark, path, ["k"], bucket_by=bucket_by)
    t.create(base_frame(spark))
    times = []
    for r in range(ROUNDS):
        spark.catalog.clearCache()
        b = batch_frame(spark, r).localCheckpoint()
        t0 = time.perf_counter()
        t.merge(b)
        times.append(round(time.perf_counter() - t0, 3))
    chk = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("k", "v", "payload").cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return {"times": times, "rows": chk["n"], "state_hash": str(chk["h"])}


def main() -> None:
    spark = get_session(app_name="bucket-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    workdir = tempfile.mkdtemp(prefix="bucket_probe_")
    try:
        flat = run(spark, workdir, None)
        bucketed = run(spark, workdir, BUCKETS)
        print(
            json.dumps(
                {
                    "table_n": TABLE_N,
                    "batch_keys": BATCH_KEYS,
                    "buckets": BUCKETS,
                    "flat": flat,
                    "bucketed": bucketed,
                    "state_equal": (
                        flat["rows"] == bucketed["rows"]
                        and flat["state_hash"] == bucketed["state_hash"]
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
