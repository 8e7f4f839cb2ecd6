"""Isolated single-query bench: identical harness mechanics to bench.py
(sf0.01 warmup, best-of-2 at the target sf, noop sink) but running ONLY
the named queries in a fresh session — the control experiment that
separates a query's own cost from cross-query bench interference.

    python tools/bench_one.py q_doc_ngram_jaccard_pairs [more...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_spark.queries import QUERIES  # noqa: E402
from data_engineering_spark.session import get_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.01"
    runs = int(os.environ.get("BENCH_ONE_RUNS", "2"))
    spark = get_session(app_name="bench-one")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = times
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
