"""Scale-safe sequential ID assignment (operators/ids)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.ids import assign_sequential_ids


def test_ids_are_dense_and_order_correct(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 5000).alias("k"), F.col("id").alias("payload")
    )
    out = assign_sequential_ids(df, ["k"], num_partitions=7)
    rows = out.orderBy("seq_id").collect()
    assert [r["seq_id"] for r in rows] == list(range(1, 5001))
    ks = [r["k"] for r in rows]
    assert ks == sorted(ks)


def test_ids_no_global_single_partition_window(spark):
    """The whole point: the physical plan's window partitions by the
    range-partition id — never an empty partitionBy over all data."""
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    out = assign_sequential_ids(df, ["k"], num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__pid" in plan
    import re
    # every Window node must carry a partition spec
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert m.group(1).strip(), plan
