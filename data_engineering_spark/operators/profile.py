"""One-pass table profiling: per-column quality stats in a single scan.

The classic data-quality probe (row count, null count, distinct count,
numeric min/max per column) is usually written as one query per column
— N scans of the table. At 100 TB that is N passes too many. Here all
per-column aggregates are packed into ONE `df.agg(...)`: Catalyst
fuses them into a single scan + single reduction, and the wide result
row is pivoted to long form with a driver-free `explode` (the pivot
runs over ONE row — it is free).

Distinct counting: `exact` uses COUNT(DISTINCT col) for every column —
Spark plans multi-distinct aggregates via Expand, which multiplies the
scan output by (n_distinct_aggs + 1); exact-correct but the expansion
is the price. `approx` swaps in HyperLogLog++
(`approx_count_distinct`) which keeps the single-scan shape with
constant memory — the right default at 100 TB where ±2% on distinct
counts is immaterial. Callers choose per use (the oracle-checked
query uses `exact`; a production profiler would not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile(
    df: DataFrame,
    cols: list[str] | None = None,
    distinct: str = "exact",
) -> DataFrame:
    """Long-form profile: one row per column with
    (col_name, n_rows, n_nulls, n_distinct, min_value, max_value).
    min/max are emitted as double for numeric columns and NULL
    otherwise (engine-neutral: no string rendering of values).
    `distinct`: 'exact' | 'approx' | 'none'."""
    if distinct not in ("exact", "approx", "none"):
        raise ValueError(f"unknown distinct mode: {distinct}")
    cols = list(cols) if cols is not None else list(df.columns)
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }

    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls__{c}")
        )
        if distinct == "exact":
            aggs.append(
                F.count_distinct(F.col(c)).cast("long").alias(f"__nd__{c}")
            )
        elif distinct == "approx":
            aggs.append(
                F.approx_count_distinct(c).cast("long").alias(f"__nd__{c}")
            )
        if c in numeric:
            aggs.append(
                F.min(F.col(c).cast("double")).alias(f"__min__{c}")
            )
            aggs.append(
                F.max(F.col(c).cast("double")).alias(f"__max__{c}")
            )
    wide = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("long")
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls__{c}").alias("n_nulls"),
            (
                F.col(f"__nd__{c}") if distinct != "none" else null_l
            ).alias("n_distinct"),
            (F.col(f"__min__{c}") if c in numeric else null_d).alias(
                "min_value"
            ),
            (F.col(f"__max__{c}") if c in numeric else null_d).alias(
                "max_value"
            ),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*structs)).alias("p")
    ).select("p.*")


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    q: float = 0.5,
) -> DataFrame:
    """Exact weighted quantile per group: the smallest value whose
    cumulative weight (in value order) reaches q × total weight — the
    lower weighted-median convention, deterministic because the
    cumulative window carries `value_col` as its own tiebreaker.

    Distinct from `percentile`/approx_percentile: each row counts
    `weight_col` times (e.g. price quantiles weighted by quantity, doc
    quality quantiles weighted by token count) without materializing
    the exploded multiset — at 100 TB, "repeat each row w times" is
    not an option; the cumulative-sum window is one shuffle on the
    group key.

    Exactness contract: weights are accumulated as-is; pass integer or
    decimal weights for cross-engine bit-exact results (double weights
    would reintroduce order-dependent float summation).

    ``q`` must lie in (0, 1]: q=0 previously remapped silently to q=1
    semantics (returning the MAX where the definition demands the min).
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1]: {q}")
    from pyspark.sql import Window

    cum = Window.partitionBy(*group_cols).orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = Window.partitionBy(*group_cols)
    flagged = df.select(
        *group_cols,
        F.col(value_col),
        F.sum(weight_col).over(cum).alias("__cw"),
        F.sum(weight_col).over(total).alias("__tw"),
    ).filter(F.col("__cw") * F.lit(1 / q) >= F.col("__tw"))
    # `__cw >= q·__tw` without float multiplication on the weight side:
    # compare cw/q >= tw only when q in (0,1]; q is a Python float and
    # 1/q is one deterministic IEEE value, applied identically per row
    return flagged.groupBy(*group_cols).agg(
        F.min(value_col).alias(f"{value_col}_wq")
    )
