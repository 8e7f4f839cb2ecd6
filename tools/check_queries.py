"""Spot-check named queries against their DuckDB oracles.

    python tools/check_queries.py q_doc_bm25_linear q_events_equidepth_histogram
    DRIVE_SF=/root/testdata/sf0.1 python tools/check_queries.py <names...>

Same normalize/hash logic as tools/drive_contract.py (the full gate) —
this is the fast inner loop while iterating on one query.
"""

import sys

sys.path.insert(0, "/root/repo")
import os

import duckdb
from pyspark.sql import SparkSession

from tools.drive_contract_lib import h, keyhash, normalize, type_classes

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
import __spark_entry__ as E
from data_engineering_spark.catalog import TPCH_TABLES, table_path

SF = os.environ.get("DRIVE_SF", "/root/testdata/sf0.01")
qs, os_ = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in TPCH_TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF, t)}'")

from data_engineering_spark.registry import ROWS_KEY_COLS, ROWS_ORACLES

names = sys.argv[1:] or sorted(os_)
bad = []
for name in names:
    try:
        raw = qs[name](spark, SF).toPandas()
        if name not in os_:
            if name in ROWS_ORACLES:
                b = con.execute(ROWS_ORACLES[name]).fetchdf()
                keys = ROWS_KEY_COLS.get(name, [])
                cols = sorted(raw.columns) == sorted(b.columns)
                rows = len(raw) == len(b)
                types = type_classes(raw) == type_classes(b)
                kh = (
                    keyhash(raw, keys) == keyhash(b, keys)
                    if keys else None
                )
                ok = cols and rows and types and kh is not False
                print(
                    f"{name}: {'MATCH_ROWS' if ok else 'MISMATCH_ROWS'}"
                    f" (cols={cols} rows={rows}/{len(raw)}:{len(b)} "
                    f"types={types} keyhash={kh} keys={keys})"
                )
                if not ok:
                    bad.append(name)
            else:
                print(f"{name}: no oracle — spark rows {len(raw)}")
            continue
        a = normalize(raw)
        b = normalize(con.execute(os_[name]).fetchdf())
        cols = list(a.columns) == list(b.columns)
        rows = len(a) == len(b)
        hm = h(a) == h(b)
        ok = cols and rows and hm
        print(
            f"{name}: {'MATCH' if ok else 'MISMATCH'} "
            f"(cols={cols} rows={rows}/{len(a)}:{len(b)} hash={hm})"
        )
    except Exception as ex:
        ok = False
        print(name, "EXC", repr(ex)[:300])
    if not ok:
        bad.append(name)
print("RESULT:", "ALL MATCH" if not bad else f"FAIL {bad}")
sys.exit(1 if bad else 0)
