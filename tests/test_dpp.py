"""Dynamic partition pruning: the scale feature that turns a
fact-dim join over a partitioned lake into a scan of ONLY the
partitions the dimension filter selects — at 100 TB the difference
between reading 3 partitions and reading 3000.

Asserted on a real partitioned parquet write: the fact scan must carry
a dynamicpruning subquery on the partition column, and results must
equal the unpruned join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "events_by_type")
    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 17).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ["view", "click", "purchase", "signup", "error"]]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    df.write.partitionBy("event_type").mode("overwrite").parquet(path)
    return path


def test_join_triggers_dynamic_partition_pruning(spark, partitioned_events):
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    fact = spark.read.parquet(partitioned_events)
    dim = spark.createDataFrame(
        [("view", 1.0), ("click", 0.5), ("purchase", 3.0),
         ("signup", 0.0), ("error", 0.0)],
        "event_type string, weight double",
    ).filter(F.col("weight") > 0.4)

    joined = fact.join(dim, "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sv"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "fact scan must be pruned by a runtime subquery on the "
        f"partition column; plan was:\n{plan[:2000]}"
    )

    got = {r.event_type: r.n for r in joined.collect()}
    # only the 3 selected partitions contribute; counts are n/5 each
    assert got == {"view": 1000, "click": 1000, "purchase": 1000}


def test_static_partition_filter_prunes_files(spark, partitioned_events):
    fact = spark.read.parquet(partitioned_events)
    q = fact.filter(F.col("event_type") == "view")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # static pruning happens at planning: the scan's partition filters
    # mention the literal, and no other partition's files are listed
    assert "view" in plan
    assert q.count() == 1000


def test_join_size_estimate_unbiased_and_deterministic(spark):
    from data_engineering_spark.operators.prune import join_size_estimate

    left = spark.createDataFrame(
        [(i % 500, i) for i in range(5000)], ["k", "v"]
    )
    right = spark.createDataFrame([(i, -i) for i in range(500)], ["k", "w"])
    true_size = left.join(right, "k").count()  # 5000 (each key 10x1)
    est = join_size_estimate(left, right, "k", "k", rate=0.2).collect()[0]
    # 20% coordinated key sample: estimate within 30% of truth here
    assert abs(est["estimated_pairs"] - true_size) / true_size < 0.3
    again = join_size_estimate(left, right, "k", "k", rate=0.2).collect()[0]
    assert again["sampled_pairs"] == est["sampled_pairs"]
    # coordinated scaling: sampled count really is ~rate of the join,
    # not rate^2 (independent sampling would give ~4% here)
    assert est["sampled_pairs"] > 0.1 * true_size
