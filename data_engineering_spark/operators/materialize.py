"""Materialization helper: eager localCheckpoint without the RDD-path
re-execution penalty.

`df.localCheckpoint(eager=True)` materializes the plan through the
RDD path, which does NOT get the optimized execution a normal action
gets — measured on the x16 scale corpus (tools/scale_curve.py data):
checkpointing a verified near-dup pair frame directly cost 143.7 s
even with its internal persists warm, while count()-ing the same
frame cost 61.0 s cold and the checkpoint AFTER materializing through
the cache cost 0.96 s. Checkpoints over already-checkpointed parents
are cheap (0.5-1 s) — the penalty applies to the FIRST checkpoint
over an expensive un-materialized subtree.

Rule: never eager-localCheckpoint an expensive subtree directly;
persist it, materialize with a normal action, checkpoint from the
cache, release the cache. That is what `eager_checkpoint` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """Eagerly checkpointed copy of `df`, materialized through the
    normal (optimized) action path: persist -> count -> checkpoint
    reading the cache -> unpersist. The count also populates any
    persist markers INSIDE df's plan (release_cache flows), which the
    direct RDD-path checkpoint skips.

    A frame the CALLER already persisted is left persisted: persist()
    on a cached frame is a no-op returning the same relation, so the
    unconditional unpersist here would silently evict the caller's own
    cache and make their later actions recompute the subtree."""
    from pyspark import StorageLevel

    caller_owned = df.storageLevel != StorageLevel.NONE
    cached = df if caller_owned else df.persist()
    # fused materialization: the lazy checkpoint truncates lineage
    # immediately, and the count job computes the plan THROUGH the
    # cache (InMemoryTableScan populates it, along with any persist
    # markers inside df's plan) while checkpointing the blocks as a
    # side effect — one action instead of count-then-checkpoint (the
    # serialized second job was pure scheduler latency on these
    # metadata-sized frames)
    out = cached.localCheckpoint(eager=False)
    out.count()
    if not caller_owned:
        cached.unpersist(blocking=False)
    return out
