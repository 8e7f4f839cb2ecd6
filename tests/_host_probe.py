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
