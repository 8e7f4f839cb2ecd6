"""Regenerate tests/bench_guard_baseline.json (see test_bench_guard).

Run from the repo root on an otherwise idle machine:
    python tests/gen_bench_baseline.py

The merge is a RATCHET (ADVICE r4): existing entries only ever get
TIGHTER (min of old and measured), new queries are added at their
measured time. A regeneration on a slow machine therefore cannot
loosen the guard for the whole suite; a query that intentionally got
slower needs its entry bumped by hand (explicit, reviewable).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from data_engineering_spark.queries import QUERIES  # noqa: E402
from data_engineering_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
WARM_DIR = "/root/testdata/sf0.001"


def main() -> None:
    from bench import _cpu_ticks

    ticks0 = _cpu_ticks()
    spark = get_session(app_name="bench-guard-baseline")
    for name in HEADLINE:
        QUERIES[name](spark, WARM_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    out: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        # best-of-3: this machine shows intermittent multi-second JIT/GC
        # stalls that can span two consecutive runs of one query; a
        # stalled BASELINE entry silently loosens that query's budget
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        spark.catalog.clearCache()  # same rationale as bench.py
    # idle-host CPU probe: the guard divides its test-time probe by
    # this to measure host contention (tests/_host_probe.py). The
    # ratchet min keeps the fastest (most idle) host's reading.
    from tests._host_probe import probe_sec

    out["__probe_sec__"] = round(probe_sec(), 4)
    # idle-session Spark-job probe (VERDICT r10 #1): the guard compares
    # a test-time run of the same tiny job in ITS session JVM against
    # this, catching the post-long-JVM inflation mode the CPU probe is
    # structurally blind to
    from tests._host_probe import jvm_probe_sec

    out["__jvm_probe_sec__"] = round(jvm_probe_sec(spark), 4)
    # steal gate (VERDICT r11 #8): refuse to write a baseline measured
    # under co-tenant hypervisor steal — the min-merge ratchet protects
    # against LOOSENING, but the idle-host probe entries (__probe_sec__
    # / __jvm_probe_sec__) min-merge too and a steal-burst run can
    # still land misleading per-query entries for NEW queries. Override
    # with GEN_BASELINE_FORCE=1 only when the reading was verified by
    # other means.
    ticks1 = _cpu_ticks()
    if ticks0 and ticks1 and ticks1[1] > ticks0[1]:
        steal_pct = (
            100.0 * (ticks1[0] - ticks0[0]) / (ticks1[1] - ticks0[1])
        )
        if steal_pct > 0.2 and not os.environ.get("GEN_BASELINE_FORCE"):
            raise SystemExit(
                f"refusing to write baseline: run-wide steal_pct "
                f"{steal_pct:.3f} > 0.2 (co-tenant noise; re-run on an "
                "idle host or set GEN_BASELINE_FORCE=1)"
            )
    path = os.path.join(os.path.dirname(__file__), "bench_guard_baseline.json")
    prior: dict[str, float] = {}
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
    merged = {
        name: min(t, prior[name]) if name in prior else t
        for name, t in out.items()
    }
    # entries for queries no longer in HEADLINE drop out with their query
    with open(path, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
        f.write("\n")
    loosened = {k for k in merged if k in prior and merged[k] > prior[k]}
    assert not loosened, loosened  # ratchet invariant
    print(json.dumps(merged, sort_keys=True))


if __name__ == "__main__":
    main()
