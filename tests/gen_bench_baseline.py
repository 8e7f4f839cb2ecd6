"""Regenerate tests/bench_guard_baseline.json (see test_bench_guard).

Run from the repo root on an otherwise idle machine:
    python tests/gen_bench_baseline.py
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
    path = os.path.join(os.path.dirname(__file__), "bench_guard_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
