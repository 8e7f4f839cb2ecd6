"""Build a deterministic sf1-equivalent directory (10x sf0.1) for the
compute-bound validation point (VERDICT r11 #2).

The sf0.1 bench is scheduler/driver-overhead bound — BENCH_r11's
8-core run BEAT its 32-core run. This tool manufactures a directory
ten times the size so the same bench entries can be re-measured where
exchanges carry real bytes, proving the operators parallelize (8-vs-32
core ratio > 1) with UNCHANGED plans.

Construction is deterministic and Spark-side (the scale_curve replica
rules, applied to every table):

- documents: doc_id += k*(max+1); replica k>0 permutes each doc's words
  by xxhash64(word, pos, k) — replicas share essentially no shingles
  (the `distinct` growth mode: candidate/shuffle terms grow, cliques
  don't). n_chars recomputed from the permuted text.
- embeddings: vec_id += k*(max+1); replica k>0 rotates the vector k
  dims (norm-preserving, decorrelates direction). The fixed serving
  query set (low ids, replica 0) stays put.
- events: event_id/user_id shifted — 10x the users, each with the
  original history (denser traffic, same window).
- lineitem + orders: l_orderkey/o_orderkey += k*(max+1) consistently,
  so the join keyspace scales while every line item still has its
  order. Other FKs (custkey/partkey/suppkey) are left as-is — 10x the
  orders over the same dimension population.
- region/nation/customer/supplier/part: copied (dimension tables).

Output: $SF1_DIR (default /tmp/spark_graft_sf1), one <table>.parquet
file each, the load_table layout. Re-running skips tables that exist.

    python tools/build_sf1.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_spark.catalog import load_table  # noqa: E402
from data_engineering_spark.session import get_session  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SF1_DIR", "/tmp/spark_graft_sf1")
SCALE = int(os.environ.get("SF1_SCALE", "10"))


def _write_single(df, dst: str, n_parts: int) -> None:
    """One parquet FILE per table (the load_table layout), written
    distributed then coalesced by pyarrow."""
    import pyarrow.parquet as pq

    tmp = dst + "_dir"
    df.repartition(n_parts).write.mode("overwrite").parquet(tmp)
    pq.write_table(pq.read_table(tmp), dst)
    shutil.rmtree(tmp)


def _union(reps):
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def build_documents(spark) -> None:
    dst = os.path.join(OUT, "documents.parquet")
    if os.path.exists(dst):
        return
    docs = load_table(spark, BASE, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    reps = []
    for k in range(SCALE):
        r = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * (max_id + 1))
        )
        if k > 0:
            # per-doc pseudorandom word permutation (scale_curve's
            # `distinct` mode): replicas share no word n-grams
            perm = F.expr(
                "array_join(transform(array_sort(transform("
                "  split(text, ' '), (x, i) -> "
                f" struct(xxhash64(x, i, {k}) AS h, x AS w))), "
                " s -> s.w), ' ')"
            )
            r = r.withColumn("text", perm).withColumn(
                "n_chars", F.length("text").cast("long")
            )
        reps.append(r)
    _write_single(_union(reps), dst, SCALE)


def build_embeddings(spark) -> None:
    dst = os.path.join(OUT, "embeddings.parquet")
    if os.path.exists(dst):
        return
    e = load_table(spark, BASE, "embeddings")
    max_id = e.agg(F.max("vec_id")).collect()[0][0]
    reps = []
    for k in range(SCALE):
        r = e.withColumn(
            "vec_id", F.col("vec_id") + F.lit(k * (max_id + 1))
        )
        if k > 0:
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
    _write_single(_union(reps), dst, SCALE)


def build_events(spark) -> None:
    dst = os.path.join(OUT, "events.parquet")
    if os.path.exists(dst):
        return
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    ev = load_table(spark, BASE, "events")
    top = ev.agg(F.max("event_id"), F.max("user_id")).collect()[0]
    max_e, max_u = top[0], top[1]
    reps = [
        ev.withColumn(
            "event_id", F.col("event_id") + F.lit(k * (max_e + 1))
        ).withColumn(
            "user_id", F.col("user_id") + F.lit(k * (max_u + 1))
        )
        for k in range(SCALE)
    ]
    _write_single(_union(reps), dst, SCALE)


def build_fact_pair(spark) -> None:
    """lineitem + orders with a consistently shifted orderkey space."""
    li_dst = os.path.join(OUT, "lineitem.parquet")
    o_dst = os.path.join(OUT, "orders.parquet")
    if os.path.exists(li_dst) and os.path.exists(o_dst):
        return
    li = load_table(spark, BASE, "lineitem")
    o = load_table(spark, BASE, "orders")
    max_ok = o.agg(F.max("o_orderkey")).collect()[0][0]
    li_reps = [
        li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * (max_ok + 1))
        )
        for k in range(SCALE)
    ]
    o_reps = [
        o.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * (max_ok + 1))
        )
        for k in range(SCALE)
    ]
    _write_single(_union(li_reps), li_dst, SCALE)
    _write_single(_union(o_reps), o_dst, SCALE)


def copy_dims() -> None:
    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(BASE, f"{t}.parquet"), dst)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_session(app_name="build-sf1")
    build_documents(spark)
    build_embeddings(spark)
    build_events(spark)
    build_fact_pair(spark)
    copy_dims()
    sizes = {
        f: round(os.path.getsize(os.path.join(OUT, f)) / 1e6, 1)
        for f in sorted(os.listdir(OUT))
    }
    print({"dir": OUT, "scale": SCALE, "mb": sizes})


if __name__ == "__main__":
    main()
