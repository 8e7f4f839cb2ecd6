"""Join-input pruning: semi-join reduction and runtime bloom filters.

At 100 TB the dominant join cost is shuffling the *wide* fact rows —
most of which a selective dimension filter will discard anyway. Two
standard reductions, both exact (no false negatives in the final
result):

- `semi_join_reduce`: prune the fact side with a key-only LEFT SEMI
  join against the filtered dimension's distinct keys *before* the real
  join. The semi join moves only the join key (8 bytes) per dim row —
  broadcastable when the filter is selective — so the wide fact columns
  are never shuffled for rows that cannot match. This is classic
  distributed-query semi-join reduction (Bernstein & Chiu, JACM 1981).
- `tune_runtime_bloom`: let Catalyst inject its own bloom-filter
  runtime filter (InjectRuntimeFilter, Spark ≥3.3) on shuffle joins.
  The bloom variant is preferable when even the distinct key set is too
  big to broadcast exactly: a 1M-key bloom at 1% FPP is ~1.2 MB
  regardless of key width, and false positives only cost wasted shuffle
  rows, never wrong results (the real join re-checks equality).

Reference parity note: the reference engine
(/root/reference/incremental_kafka_s3_cdc.py) joins CDC batches
unreduced; these operators are the §2.11 scale extensions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def semi_join_reduce(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    *,
    broadcast_keys: bool = True,
) -> DataFrame:
    """Return `fact` restricted to rows whose `on` keys appear in `dim`.

    The distinct key projection keeps the reduction narrow: whatever
    width `dim` has, only the join columns travel. With
    `broadcast_keys=True` (the default — correct whenever the filtered
    dim's key set fits the broadcast threshold) the prune is a
    broadcast hash semi join: **zero shuffle of the fact table**. Set
    it False for huge key sets; the prune degrades to a shuffle semi
    join that still only moves `fact`'s key columns + row ids, not the
    wide payload (Spark shuffles the full fact row for the semi join
    itself, so in that regime prefer `tune_runtime_bloom`).

    Exactness: LEFT SEMI on equality keys has no false positives, so
    `fact.join(dim, on)` == `semi_join_reduce(fact, dim, on).join(dim,
    on)` row-for-row; the reduction only changes the plan, never the
    result (oracle-checked by q_semi_reduced_revenue).
    """
    cols = [on] if isinstance(on, str) else list(on)
    keys = dim.select(*cols).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    return fact.join(keys, cols, "left_semi")


def tune_runtime_bloom(
    spark: SparkSession,
    *,
    enabled: bool = True,
    creation_side_threshold: str | None = None,
    application_side_threshold: str | None = None,
) -> None:
    """Enable Catalyst's injected bloom-filter runtime filters.

    Spark's InjectRuntimeFilter adds `BloomFilterAggregate` on the
    selective (creation) side of a shuffle join and `might_contain` on
    the large (application) side, pruning shuffle input at runtime.
    Defaults gate it to creation side ≤10 MB and application-side scan
    ≥10 GB — right for a real cluster; tests lower both to force
    injection at toy scale and assert the plan shape
    (tests/test_plans.py).
    """
    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": str(enabled).lower(),
    }
    if creation_side_threshold is not None:
        conf[
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        ] = creation_side_threshold
    if application_side_threshold is not None:
        conf[
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ] = application_side_threshold
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # locked-down session: keep going with engine defaults


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    rate: float = 0.1,
    salt: str = "js",
) -> DataFrame:
    """Estimate |left JOIN right| without running the join:
    COORDINATED key sampling — both sides keep exactly the keys whose
    shared deterministic hash lands under `rate`, so a sampled key
    survives on BOTH sides or NEITHER. The joined sample count scaled
    by 1/rate is then an unbiased estimator of the full join
    cardinality (key-level inclusion is a single Bernoulli(rate) draw
    shared by both sides: E[sample join size] = rate * true size —
    the coordinated-sampling identity; independent per-side sampling
    would scale by 1/rate² and square the variance).

    The input a join planner needs BEFORE committing to a shuffle
    strategy: runs on rate-sized fractions of both tables, one small
    shuffle. Deterministic (hash-keyed like every sampler here), so
    the estimate is reproducible and oracle-checkable — same contract
    as bernoulli_sample.

    Returns one row: (sampled_pairs long, estimated_pairs double).
    """
    from data_engineering_spark.operators.sketches import (
        HASH_SPACE,
        uniform_hash60,
    )

    cut = F.lit(int(rate * HASH_SPACE))

    def keep(df: DataFrame, key: str, alias: str) -> DataFrame:
        h = uniform_hash60(
            F.concat(F.col(key).cast("string"), F.lit(salt))
        )
        # distinct output names so identical key names on both sides
        # don't collide in the join condition
        return df.filter(h < cut).select(F.col(key).alias(alias))

    joined = keep(left, left_key, "__lk").join(
        keep(right, right_key, "__rk"),
        F.col("__lk") == F.col("__rk"),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("sampled_pairs"),
        (F.count(F.lit(1)).cast("double") / F.lit(rate)).alias(
            "estimated_pairs"
        ),
    )
