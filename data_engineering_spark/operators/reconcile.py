"""Reconciliation + incremental aggregate maintenance.

`reconcile` is the anti-entropy audit between a source snapshot and a
CDC-maintained lake table (the operational companion to
snapshot/jdbc_snapshot + cdc/pipeline): one NULL-safe full-outer
comparison keyed on the primary key, emitting exactly the divergent
rows. `merge_agg_state` is incremental materialized-view maintenance:
algebraic aggregates merge state + delta without rescanning history.

Both are one-shuffle designs: reconcile shuffles both sides on the key
(the same cost as the MERGE that maintains the table); agg merge
shuffles state+delta on the group key, and partial aggregation makes
the delta side map-combine before it moves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile(
    expected: DataFrame,
    actual: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level drift between two keyed tables.

    Returns (keys..., status) for every divergent key:
    - 'missing'  — in `expected`, absent from `actual`
    - 'extra'    — in `actual`, absent from `expected`
    - 'mismatch' — present in both, at least one compare column differs
      (NULL-safe: NULL == NULL, NULL != value)

    Clean keys emit nothing, so at 100 TB the output is the drift, not
    the table. One full-outer shuffle on the key.
    """
    key_list = list(keys)
    cmp = [
        c
        # `is None`, not truthiness: compare_cols=[] is the explicit
        # presence-only audit (report missing/extra keys, ignore values)
        for c in (
            expected.columns if compare_cols is None else compare_cols
        )
        if c not in set(key_list)
    ]
    e = expected.select(
        *key_list, *[F.col(c).alias(f"__e_{c}") for c in cmp]
    ).withColumn("__e", F.lit(1))
    a = actual.select(
        *key_list, *[F.col(c).alias(f"__a_{c}") for c in cmp]
    ).withColumn("__a", F.lit(1))
    j = e.join(a, key_list, "full_outer")

    differs = F.lit(False)
    for c in cmp:
        differs = differs | ~F.col(f"__e_{c}").eqNullSafe(F.col(f"__a_{c}"))
    status = (
        F.when(F.col("__a").isNull(), "missing")
        .when(F.col("__e").isNull(), "extra")
        .when(differs, "mismatch")
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_list, "status")
    )


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Merge two algebraic aggregate states (same schema: keys +
    sum-able columns — sums, counts, min/max need their own combiner).

    This is the incremental refresh of a materialized aggregate: the
    nightly 100 TB rescan becomes state ⊎ today's partial — cost
    proportional to the DELTA, which is the entire point. Works because
    sum/count are commutative monoids; compose with decimal-accumulated
    sums (registry.dec) for cross-engine-exact doubles.
    """
    key_list = list(keys)
    u = state.select(*key_list, *sum_cols).unionByName(
        delta.select(*key_list, *sum_cols)
    )
    return u.groupBy(*key_list).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def table_changes(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    op_col: str = "__op",
) -> DataFrame:
    """Change-feed GENERATION: diff two versions of a keyed table into
    a CDC event stream — the inverse of cdc/pipeline (which APPLIES
    such a feed). Semantics follow the Debezium op codes the reference
    consumes (/root/reference/incremental_kafka_s3_cdc.py:272-274):

    - 'c' (create): key only in `new` — payload = new row
    - 'u' (update): key in both, any non-key column differs (NULL-safe)
      — payload = new row
    - 'd' (delete): key only in `old` — payload = old row (the "before"
      image, what Debezium's rewrite mode emits for deletes)

    Unchanged keys emit nothing, so downstream cost follows the delta.
    One full-outer shuffle on the key; the NULL-safe comparison runs in
    whole-stage codegen (no row hashing round-trip through Python).
    """
    key_list = list(keys)
    # union of both sides' non-key columns, in new-then-old-only order:
    # a column added in `new` (schema evolution) compares against NULL on
    # the old side instead of raising an unresolved-column error, and a
    # column dropped from `new` still reaches delete payloads
    old_cols = set(old.columns)
    new_cols = set(new.columns)
    cmp = [c for c in new.columns if c not in set(key_list)] + [
        c for c in old.columns if c not in set(key_list) and c not in new_cols
    ]

    def _side(df, present, tag):
        return df.select(
            *key_list,
            *[
                (F.col(c) if c in present else F.lit(None)).alias(f"__{tag}_{c}")
                for c in cmp
            ],
        )

    o = _side(old, old_cols, "o").withColumn("__in_old", F.lit(1))
    n = _side(new, new_cols, "n").withColumn("__in_new", F.lit(1))
    j = o.join(n, key_list, "full_outer")

    differs = F.lit(False)
    for c in cmp:
        if c not in new_cols:
            # dropped column: the new image cannot carry it, comparing its
            # old value vs NULL would mark every surviving row 'u' forever
            continue
        differs = differs | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), "c")
        .when(F.col("__in_new").isNull(), "d")
        .when(differs, "u")
    )
    payload = [
        F.when(F.col("__in_new").isNull(), F.col(f"__o_{c}"))
        .otherwise(F.col(f"__n_{c}"))
        .alias(c)
        for c in cmp
    ]
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*key_list, *payload, op_col)
    )
