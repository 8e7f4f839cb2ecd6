"""Host-contention probe for the bench guard (VERDICT r9 #2).

The guard's budgets assume the timing host is as idle as the one that
generated the baseline. That assumption broke twice (r8, r9): the
full-suite run on a loaded box inflated one sub-second query past its
budget, the solo re-run passed, and a human had to recognize the
fingerprint. This probe makes the guard recognize it instead: a fixed
CPU workload (sha256 over 4 MiB, best of 3) is timed at baseline
generation on the idle machine and again at test time; their ratio is
the measured host-load factor, and the guard widens its allowance by
exactly that factor. A genuine plan regression inflates query time but
not the probe; CPU-scheduler contention inflates both.
"""

from __future__ import annotations

import hashlib
import time

_PAYLOAD = b"\xa5" * (1 << 22)  # 4 MiB
_ROUNDS = 16  # ~50 ms nominal: long enough to sample the scheduler


def probe_sec() -> float:
    """Best-of-3 wall time of the fixed CPU workload."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(_ROUNDS):
            hashlib.sha256(_PAYLOAD).digest()
        best = min(best, time.perf_counter() - t0)
    return best


def load_factor(baseline_probe_sec: float | None) -> float:
    """measured/nominal host-load ratio, floored at 1 (a faster-than-
    baseline probe never TIGHTENS budgets) and capped at 4 (beyond
    that the host is so loaded no timing is meaningful — better a
    loud failure than a guard stretched to vacuity)."""
    if not baseline_probe_sec or baseline_probe_sec <= 0:
        return 1.0
    return min(max(probe_sec() / baseline_probe_sec, 1.0), 4.0)


def jvm_probe_sec(spark) -> float:
    """Best-of-3 wall time of a fixed tiny Spark job (the bench.py
    warmup shape: range->sum through codegen) in the CURRENT session
    JVM — the probe the pure-python CPU workload cannot be (VERDICT
    r10 #1): after a ~50-minute suite the long-lived JVM enters an
    inflation mode (GC pressure / JIT state) that slows every Spark
    job while the python probe stays flat. Timing an actual Spark job
    in the same JVM sees exactly that mode. One untimed warmup first
    so a cold codegen compile of the probe shape doesn't read as
    load."""
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        best = min(best, time.perf_counter() - t0)
    return best


def combined_load_factor(baseline: dict, spark) -> float:
    """max(cpu_factor, jvm_factor) against the baseline's recorded
    idle-host probes — scheduler contention moves the CPU probe,
    post-long-JVM inflation moves the Spark probe; the guard widens
    by whichever mode is actually present. Same floor/cap as
    load_factor."""
    cpu = load_factor(baseline.get("__probe_sec__"))
    base_jvm = baseline.get("__jvm_probe_sec__")
    if not base_jvm or base_jvm <= 0:
        return cpu
    jvm = min(max(jvm_probe_sec(spark) / base_jvm, 1.0), 4.0)
    return max(cpu, jvm)
