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
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # expression ids (#123) and exchange/subquery ids are session-local
    return re.sub(r"#\d+[L]?", "#", plan)


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
        tmp = os.path.join(cache_root, f"__build-{key}-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, dest)  # atomic publish; losers clean up
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(dest)
