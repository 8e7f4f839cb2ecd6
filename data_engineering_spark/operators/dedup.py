"""Deduplication operators.

Parity core: the reference's last-write-wins CDC compaction
(/root/reference/incremental_kafka_s3_cdc.py:321-325) sorts by `__ts_ms`
and drops duplicates keep-last via pandas-on-Spark — an O(global sort)
plan that also breaks whole-stage codegen. We express the same semantics
as a window `row_number`, which shuffles once by key and stays entirely
in the JVM (SURVEY.md §2.5 A2 / §2.6 W1).

Extension operators (SURVEY.md §2.11): exact hash dedup, n-gram Jaccard
near-dup via shingle inverted index, MinHash-LSH, SimHash. All are
shuffle-on-key designs that scale horizontally; none collect to the
driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_last(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Last-write-wins per key: the row with max `order_col` survives.

    Replaces /root/reference/incremental_kafka_s3_cdc.py:321-325
    (pandas-on-Spark sort + drop_duplicates keep='last'). The reference's
    keep='last' after a sort is positionally tie-broken; we make the order
    total via explicit `tiebreakers` (e.g. Kafka offset / event id) so the
    result is deterministic — documented deviation, SURVEY.md §7 (d).

    Scale: one hash-shuffle on `keys`; skewed hot keys are handled by AQE.
    No global sort, no Python round-trip.
    """
    order = [F.col(order_col).desc()] + [F.col(t).desc() for t in tiebreakers]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_last_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Skew-proof last-write-wins: `max(struct(order, tiebreakers,
    payload))` per key instead of a `row_number` window.

    Why it exists: window functions get ONE task per key — AQE splits
    skewed shuffle JOINS but not skewed window partitions, so a hot CDC
    key owning 10% of a batch pins a straggler under `keep_last`. `max`
    is algebraic: partial (map-side) aggregation combines the hot key
    within every input partition BEFORE the shuffle, so the reduce side
    sees one row per (key, map task) — skew becomes map-parallel work.

    Result is identical to `keep_last` whenever (order_col,
    *tiebreakers) totally orders rows within a key; on residual ties
    the lexicographic max of the remaining payload wins (deterministic,
    engine-independent — the window variant's tie is resolved by the
    same explicit ordering). Requires all columns to be orderable
    (structs/arrays fine, maps are not).
    """
    key_set = set(keys)
    payload = [c for c in df.columns if c not in key_set]
    rest = [
        c for c in payload if c != order_col and c not in set(tiebreakers)
    ]
    ordered = [order_col, *tiebreakers, *rest]
    out = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.max(F.struct(*[F.col(c) for c in ordered])).alias("__s")
    )
    return out.select(
        *[
            F.col(c) if c in key_set else F.col(f"__s.{c}").alias(c)
            for c in df.columns
        ]
    )


def keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """First-writer-wins (ascending twin of `keep_last`)."""
    order = [F.col(order_col).asc()] + [F.col(t).asc() for t in tiebreakers]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def content_hash(col: Column | str, num_bits: int = 256) -> Column:
    """Stable content fingerprint for exact dedup: sha2 over the column.

    At 100 TB we group by the 64-char hash (or a 16-byte prefix), never by
    the raw document text — the shuffle moves 64 bytes per row instead of
    the full payload.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), num_bits)


def dedup_exact(
    df: DataFrame,
    content_cols: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Exact dedup: keep the lowest-id row per distinct content.

    Adds `n_copies` (cluster size). Groups on a sha2 fingerprint of the
    concatenated content columns so the shuffle key is fixed-width
    regardless of document size — and computes winner AND cluster size
    in ONE algebraic aggregation (min-struct + count): the previous
    window + separate groupBy + join shape shuffled the fingerprinted
    corpus three times and evaluated the sha2 twice, and a window gets
    one task per hot fingerprint while min() pre-combines map-side
    (the keep_last_agg skew argument). Requires orderable columns
    (structs/arrays fine, maps are not) — same contract as
    keep_last_agg."""
    keyed = df.withColumn("__fp", fingerprint_expr(content_cols))
    rest = [c for c in df.columns if c != id_col]
    agg = keyed.groupBy("__fp").agg(
        F.min(
            F.struct(F.col(id_col), *[F.col(c) for c in rest])
        ).alias("__w"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return agg.select(
        *[F.col(f"__w.{c}").alias(c) for c in df.columns], "n_copies"
    )


def fingerprint_expr(content_cols: Sequence[str]) -> Column:
    """Boundary- and NULL-unambiguous content fingerprint expression.

    Joins columns on a \\x01 unit separator (('ab','c') != ('a','bc'))
    and encodes NULL as a \\x00 sentinel distinct from '' (concat_ws
    alone silently skips NULLs, so ('a', NULL) would collide with
    ('a', '')).
    """
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\u0000"))
        for c in content_cols
    ]
    return content_hash(F.concat_ws("\u0001", *parts))


def fingerprint_store(df: DataFrame, content_cols: Sequence[str]) -> DataFrame:
    """Distinct fingerprints of a corpus: the persistent 'seen' set an
    incremental ingest pipeline carries between batches. 64 bytes per
    distinct document regardless of document size — at 100 TB of text
    the store is a few hundred GB of hashes, a normal parquet table."""
    return df.select(fingerprint_expr(content_cols).alias("__fp")).distinct()


def dedup_incremental(
    new_df: DataFrame,
    seen: DataFrame,
    content_cols: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Incremental exact dedup of an incoming batch against a historical
    fingerprint store (`seen`, as produced by `fingerprint_store`).

    Two stages, both keyed on the fixed-width fingerprint:
    1. within-batch: lowest-`id_col` row survives per fingerprint
       (keep_first — re-crawled copies inside one batch collapse);
    2. cross-corpus: LEFT ANTI join against `seen` drops anything the
       corpus already contains.

    Scale: the anti join shuffles 64-byte hashes, never documents. When
    the batch is small relative to the store, `prune.tune_runtime_bloom`
    lets Catalyst build a bloom of the batch fingerprints and prune the
    store scan at runtime; false positives only cost shuffle rows (the
    anti join re-checks equality). Unioning the survivors' fingerprints
    into `seen` yields the next batch's store, making the pipeline
    idempotent: re-running a batch produces zero survivors.
    """
    keyed = new_df.withColumn("__fp", fingerprint_expr(content_cols))
    batch_winners = keep_first(keyed, ["__fp"], id_col)
    return batch_winners.join(seen, "__fp", "left_anti").drop("__fp")
