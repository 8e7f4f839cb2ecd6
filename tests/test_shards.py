"""Training-shard export (operators/shards): sizes, determinism,
manifest verification, tamper detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.shards import (
    verify_shards,
    write_sharded_dataset,
)


def _corpus(spark, n=1050):
    return spark.range(n).select(
        (F.col("id") * 2654435761 % 1_000_003).alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_shard_sizes_and_order(spark, tmp_path):
    path = str(tmp_path / "ds")
    man = write_sharded_dataset(
        _corpus(spark), path, ["doc_id"], shard_size=100, num_partitions=5
    ).collect()
    sizes = {r["shard"]: r["n_rows"] for r in man}
    assert sorted(sizes) == list(range(11))
    assert all(sizes[s] == 100 for s in range(10)) and sizes[10] == 50
    # shard boundaries respect the global doc_id order
    data = spark.read.parquet(path)
    mx = {
        r["shard"]: (r["mn"], r["mx"])
        for r in data.groupBy("shard")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .collect()
    }
    for s in range(10):
        assert mx[s][1] < mx[s + 1][0]
    # exactly one data file per shard
    files = [f for f in data.inputFiles()]
    assert len(files) == 11


def test_rerun_is_deterministic(spark, tmp_path):
    a = write_sharded_dataset(
        _corpus(spark), str(tmp_path / "a"), ["doc_id"], 128
    ).collect()
    b = write_sharded_dataset(
        _corpus(spark), str(tmp_path / "b"), ["doc_id"], 128
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_verify_detects_tamper(spark, tmp_path):
    path = str(tmp_path / "v")
    write_sharded_dataset(_corpus(spark, 400), path, ["doc_id"], 100)
    ok = verify_shards(spark, path, ["doc_id"])
    assert all(r["ok"] for r in ok.collect())
    # tamper: rewrite shard 2 with one row dropped
    s2 = spark.read.parquet(f"{path}/shard=2")
    s2.limit(99).write.mode("overwrite").parquet(f"{path}/shard=2")
    after = {r["shard"]: r["ok"] for r in
             verify_shards(spark, path, ["doc_id"]).collect()}
    assert after[2] is False
    assert all(v for s, v in after.items() if s != 2)


def test_jsonl_gzip_shards(spark, tmp_path):
    """Training-wire export: shard=NNNN dirs of gzipped JSON Lines,
    same manifest contract as parquet."""
    import gzip
    import json
    import glob

    path = str(tmp_path / "jsonl")
    man = write_sharded_dataset(
        _corpus(spark, 250), path, ["doc_id"], shard_size=100,
        fmt="json", compression="gzip",
    )
    assert man.agg(F.sum("n_rows")).collect()[0][0] == 250
    files = glob.glob(f"{path}/shard=*/*.json.gz")
    assert len(files) == 3
    with gzip.open(files[0], "rt") as f:
        row = json.loads(f.readline())
    assert set(row) == {"doc_id", "text"}
    ok = verify_shards(spark, path, ["doc_id"], fmt="json")
    assert all(r["ok"] for r in ok.collect())
