"""Skew-handling utilities (SCALE.md: 'pathological single-key skew').

AQE's skew-join splitting covers joins; these cover skewed
*aggregations* and *windows*, where one hot key (a bot user with 10⁹
events, an empty-string join key) would pin a single task:

- `salted_agg`: two-stage aggregation — stage 1 aggregates per
  (key, salt) across `num_salts` random buckets, stage 2 combines the
  partials per key. Works for any algebraic aggregate (sum/count/min/
  max/decimal-sum) expressed as (partial, combine) column pairs.
- `salted_broadcast_join`: replicate the small side `num_salts`× and
  salt the big side — removes the hot-key bottleneck from a shuffle
  join when broadcast isn't possible for the whole small side but is
  for small×salts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, num_salts: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic pseudo-random salt derived from the row content
    hash plus the input partition id (NOT rand(): retries/speculative
    tasks must re-derive the same salt or results change under
    recomputation; spark_partition_id is plan-deterministic).

    Why the partition id participates: the motivating hot key is often
    IDENTICAL rows after projection (one bot user, one event shape) —
    a pure content hash would give every duplicate the same salt and
    re-pin the skew onto one task. Content-identical rows in the SAME
    input partition still share a salt, but those already collapse in
    that task's map-side partial aggregate; the cross-partition copies
    are the ones that must spread, and the partition id spreads them."""
    return df.withColumn(
        col_name,
        F.pmod(
            F.xxhash64(*df.columns, F.spark_partition_id()),
            F.lit(num_salts),
        ),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[Column, Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    `partials` maps output name → (stage1 aggregate over raw rows,
    stage2 combiner over stage-1 partial columns). Example:

        salted_agg(events, ["user_id"], {
            "n":   (F.count(F.lit(1)),      F.sum("n")),
            "mx":  (F.max("value"),         F.max("mx")),
        })

    Stage 1 shuffles on (keys, salt) — the hot key spreads over
    `num_salts` tasks; stage 2 shuffles `num_salts` rows per key.
    """
    salted = with_salt(df, num_salts)
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[comb.alias(name) for name, (_, comb) in partials.items()]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    num_salts: int = 8,
) -> DataFrame:
    """Inner join where the big side's key distribution is skewed: salt
    the big side, replicate the small side per salt, equi-join on
    (keys, salt). The replicated small side is broadcast."""
    salted_big = with_salt(big, num_salts)
    replicated = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(num_salts).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    return salted_big.join(
        F.broadcast(replicated), [*keys, "__salt"]
    ).drop("__salt")


def hybrid_skew_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    hot_threshold: int = 1_000_000,
    sample_fraction: float = 1.0,
) -> DataFrame:
    """Bifurcated hot/cold inner join: keys hotter than `hot_threshold`
    rows take a broadcast path, everything else takes the normal shuffle
    join — the classic remedy when ONE key (empty string, bot user)
    would pin a single shuffle partition and AQE's in-stage splitting
    isn't enough (e.g. the downstream operator needs key-locality).

    Correctness does not depend on WHICH keys are deemed hot — any
    hot/cold split of the key space yields the same union — so hot-key
    detection may run on a `sample_fraction` sample at scale (the
    threshold is scaled accordingly). The hot-key list is bounded by
    construction (≤ sampled_rows/threshold keys) and is materialized
    once via localCheckpoint so the three consumers (semi, anti, small
    filter) don't re-scan `big` to recompute it.

    Plan shape: one count shuffle of fixed-width keys (on the sample),
    one broadcast semi + one broadcast anti over `big` (same scan, AQE
    reuses the exchange), a broadcast hash join for the hot slice and a
    plain shuffle join for the cold slice. The cold join's key space
    has no hot keys left, so its worst task is bounded by the
    threshold.
    """
    key_list = list(keys)
    src = big if sample_fraction >= 1.0 else big.sample(
        fraction=sample_fraction, seed=41
    )
    eff = max(1, int(hot_threshold * sample_fraction))
    hot_keys = (
        src.groupBy(*key_list)
        .agg(F.count(F.lit(1)).alias("__key_n"))
        .filter(F.col("__key_n") >= eff)
        .select(*key_list)
        .localCheckpoint(eager=False)
    )
    hot_big = big.join(F.broadcast(hot_keys), key_list, "left_semi")
    cold_big = big.join(F.broadcast(hot_keys), key_list, "left_anti")
    small_hot = small.join(F.broadcast(hot_keys), key_list, "left_semi")
    hot = hot_big.join(F.broadcast(small_hot), key_list)
    cold = cold_big.join(small, key_list)
    return hot.unionByName(cold)
