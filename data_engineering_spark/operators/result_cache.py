"""Materialized result cache keyed by plan + input fingerprints.

The lakehouse "result cache": a dashboard that re-issues the same
aggregate every few minutes should pay the 100 TB scan once, not per
refresh. Engines like Snowflake/BigQuery do this inside the service;
on a plain-parquet lake the cache is just another parquet directory —
what needs care is the KEY:

- the OPTIMIZED logical plan (normalized: Catalyst's per-session
  expression ids stripped), so the key survives session restarts and
  ignores cosmetic differences the optimizer removes;
- the input fingerprint: every input file path + (mtime, size) from
  `df.inputFiles()`, so any data change — new partition, rewritten
  file, compaction — misses the cache instead of serving stale rows.

Both are metadata probes: no data is read to decide hit/miss. On miss
the result is written ONCE (atomic rename, concurrent misses converge)
and served from parquet thereafter — with predicate pushdown on the
cached columns for free.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame


def _normalized_plan(df: DataFrame) -> str:
    # Catalyst's own canonicalized plan: expression ids normalize to 0
    # deterministically WITHOUT touching literal values. The previous
    # regex (strip '#<digits>' everywhere) also mangled string literals
    # containing '#' — filter(s == 'x#1') and filter(s == 'x#2')
    # collided on one key and the cache served the WRONG query's rows.
    plan = (
        df._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    )
    # exchange/subquery ids ('[id=#123]') remain session-local in the
    # textual form; they only ever appear inside bracketed id tags, so
    # this narrow strip cannot reach user literals
    return re.sub(r"\[id=#\d+\]", "[id=#]", plan)


def _input_fingerprint(df: DataFrame) -> str:
    parts = []
    for f in sorted(df.inputFiles()):
        local = f[len("file:"):] if f.startswith("file:") else f
        try:
            st = os.stat(local)
            parts.append(f"{f}|{st.st_mtime_ns}|{st.st_size}")
        except OSError:
            parts.append(f)  # remote path: identity only
    return "\n".join(parts)


def cache_key(df: DataFrame) -> str:
    fp = _input_fingerprint(df)
    if not fp:
        # No input files (JDBC scan, LocalRelation, in-memory frame): the
        # plan text alone cannot see data changes, so a key would serve
        # stale rows. The cache is file-backed-plans only by contract.
        raise ValueError(
            "result cache requires a file-backed plan: df.inputFiles() is "
            "empty (JDBC/in-memory sources cannot be fingerprinted)"
        )
    h = hashlib.sha256()
    h.update(_normalized_plan(df).encode())
    h.update(b"\x00")
    h.update(fp.encode())
    return h.hexdigest()[:32]


def cached_result(df: DataFrame, cache_root: str) -> DataFrame:
    """Serve `df`'s result from the cache, computing it at most once
    per (plan, input-state). Returns a DataFrame reading the cached
    parquet (schema and row order semantics identical to a fresh
    computation followed by a parquet round-trip)."""
    key = cache_key(df)
    dest = os.path.join(cache_root, key)
    spark = df.sparkSession
    if not os.path.isdir(dest):
        _sweep_dead_builds(cache_root)
        tmp = os.path.join(cache_root, f"__build-{key}-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, dest)  # atomic publish; losers clean up
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(dest)


def _sweep_dead_builds(cache_root: str, max_age_s: float = 3600.0) -> None:
    """GC crash debris: a builder killed between write and rename
    leaves a __build-* dir no code path would otherwise touch (every
    retry uses a fresh uuid), so the cache root grew without bound.
    The age cutoff protects concurrent live builders — same policy as
    maintenance.remove_orphans."""
    import glob
    import time

    cutoff = time.time() - max_age_s
    for d in glob.glob(os.path.join(cache_root, "__build-*")):
        try:
            if os.path.getmtime(d) <= cutoff:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            pass
