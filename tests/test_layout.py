"""Z-order layout: interleaving math + the actual pruning property."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.layout import (
    file_stat_tightness,
    minmax_scale_to_int,
    write_zordered,
    zorder_key,
)

SF = "/root/testdata/sf0.001"


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(5, 3)], ["a", "b"])  # 101, 011
    out = df.select(
        zorder_key([F.col("a").cast("long"), F.col("b").cast("long")], 3)
        .alias("z")
    ).collect()[0]["z"]
    # bit b of col i at position b*2+i:
    # a=101: bits 0,2 -> positions 0,4 ; b=011: bits 0,1 -> positions 1,3
    assert out == (1 << 0) + (1 << 4) + (1 << 1) + (1 << 3)


def test_minmax_scale_edges(spark):
    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (None,), (250.0,)], "x double"
    )
    vals = [
        r[0]
        for r in df.select(
            minmax_scale_to_int("x", 0, 100, 8)
        ).collect()
    ]
    assert vals[0] == 0 and vals[2] == 255
    assert vals[1] == 127  # mid-scale
    assert vals[3] == 0  # NULL -> 0
    assert vals[4] == 255  # clamped


def test_zordered_files_are_tight_in_both_dims(spark, tmp_path):
    """The point of the layout: after z-ordering orders by (custkey,
    orderdate), each file's min/max range in BOTH columns is a small
    fraction of the global range — a plain single-column sort can only
    tighten one. Threshold 0.5 vs the naive layout's ~1.0."""
    src = load_table(spark, SF, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("o_day"),
    )
    # 16 files = 4 leading z-bits = both dimensions split into quarters
    # (a power of 4 splits evenly across 2 interleaved dims; 8 files
    # would quarter one dim but only halve the other)
    naive = str(tmp_path / "naive")
    src.repartition(16).write.parquet(naive)
    zpath = str(tmp_path / "zorder")
    write_zordered(src, zpath, ["o_custkey", "o_day"], num_files=16)

    def tightness(path, col):
        df = spark.read.parquet(path).withColumn(
            "__file", F.input_file_name()
        )
        return file_stat_tightness(df, col)

    for col in ("o_custkey", "o_day"):
        zt, nt = tightness(zpath, col), tightness(naive, col)
        # ~0.25 + range-sampler noise in theory; 0.45 with headroom
        assert zt < 0.45, (col, zt)
        assert zt < nt * 0.6, (col, zt, nt)  # clearly tighter than naive
    # still the same data
    assert spark.read.parquet(zpath).count() == src.count()


def test_range_partitioned_write_tightness(spark, tmp_path):
    """Range layout on one column: each file owns ~1/n of the value
    space (so point/range filters prune to ~1 file), vs ~1.0 for the
    hash-shuffled naive layout."""
    from data_engineering_spark.operators.layout import (
        write_range_partitioned,
    )

    src = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    naive = str(tmp_path / "naive_r")
    src.repartition(8).write.parquet(naive)
    rpath = str(tmp_path / "ranged")
    write_range_partitioned(src, rpath, "o_totalprice", num_files=8)

    def tightness(path):
        df = spark.read.parquet(path).withColumn(
            "__file", F.input_file_name()
        )
        return file_stat_tightness(df, "o_totalprice")

    rt, nt = tightness(rpath), tightness(naive)
    assert rt < 0.3, rt          # ~1/8 + sampler noise
    assert nt > 0.8, nt          # hash layout spans ~everything
    assert spark.read.parquet(rpath).count() == src.count()


def test_zonemap_skips_files_exactly(spark, tmp_path):
    """Zone-map pruning on a range-clustered table: a narrow predicate
    reads a strict minority of files yet returns exactly the rows a
    full scan + filter would."""
    from data_engineering_spark.operators.layout import (
        write_range_partitioned,
    )
    from data_engineering_spark.operators.zonemap import (
        build_zonemap,
        pruned_read,
    )

    src = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    path = str(tmp_path / "zm")
    write_range_partitioned(src, path, "o_totalprice", num_files=8)
    zm = build_zonemap(spark, path, ["o_totalprice"])
    assert zm.count() == len(spark.read.parquet(path).inputFiles())

    lo, hi = 1000.0, 20000.0
    pruned, n_read, n_total = pruned_read(
        spark, path, zm, "o_totalprice", lo, hi
    )
    assert n_total >= 8 and n_read < n_total / 2, (n_read, n_total)
    expect = sorted(
        r["o_orderkey"]
        for r in src.filter(F.col("o_totalprice").between(lo, hi)).collect()
    )
    got = sorted(r["o_orderkey"] for r in pruned.collect())
    assert got == expect and len(got) > 0

    # empty-range predicate: zero files opened, empty exact result
    out, n_read0, _ = pruned_read(
        spark, path, zm, "o_totalprice", -500.0, -100.0
    )
    assert n_read0 == 0 and out.count() == 0


def test_zonemap_conjunction_multiplies_skipping(spark, tmp_path):
    """Two-column predicate over a Z-ordered layout: the conjunction
    prunes MORE files than either predicate alone, and results stay
    exact."""
    from data_engineering_spark.operators.layout import write_zordered
    from data_engineering_spark.operators.zonemap import (
        build_zonemap,
        pruned_read,
    )

    src = load_table(spark, SF, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("o_day"),
    )
    path = str(tmp_path / "zm2")
    write_zordered(src, path, ["o_custkey", "o_day"], num_files=16)
    zm = build_zonemap(spark, path, ["o_custkey", "o_day"])

    r = {"o_custkey": (100, 400), "o_day": (200, 900)}
    both, n_both, total = pruned_read(spark, path, zm, ranges=r)
    _, n_a, _ = pruned_read(spark, path, zm, "o_custkey", 100, 400)
    _, n_b, _ = pruned_read(spark, path, zm, "o_day", 200, 900)
    assert n_both <= min(n_a, n_b) < total
    expect = sorted(
        x["o_orderkey"]
        for x in src.filter(
            F.col("o_custkey").between(100, 400)
            & F.col("o_day").between(200, 900)
        ).collect()
    )
    assert sorted(x["o_orderkey"] for x in both.collect()) == expect
