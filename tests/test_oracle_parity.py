"""Mirror of the driver's DuckDB-oracle gate (SURVEY.md §5).

For every registered query with an oracle: run the Spark DataFrame and
the DuckDB SQL on the same parquet tables, normalize (sort columns by
name, sort rows by all columns), and require exact equality — our
determinism policy (decimal-accumulated aggregates, total orders under
limits) makes bit-exact agreement achievable, so we assert it rather
than an epsilon.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_engineering_spark.catalog import TPCH_TABLES, table_path
from data_engineering_spark.queries import ORACLES, QUERIES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con.execute(sql).fetchdf()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object and s.map(
            lambda v: v is None or isinstance(v, (dt.date, dt.datetime))
        ).all() and s.notna().any():
            # Spark DateType arrives as datetime.date objects; DuckDB DATE
            # as datetime64 — unify both to datetime64[us]
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df


ORACLE_QUERIES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    oracle_df = run_oracle(ORACLES[name], sf_dir)

    a, b = normalize(spark_df), normalize(oracle_df)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating):
            mism = ~(
                (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
            )
        else:
            mism = av != bv
        assert not mism.any(), (
            f"{name}.{c}: {int(mism.sum())} mismatches; "
            f"first: spark={av[mism][:3]} oracle={bv[mism][:3]}"
        )


def test_rows_only_queries_run(spark, sf_dir):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(E.oracle_sql()) <= set(E.queries())
