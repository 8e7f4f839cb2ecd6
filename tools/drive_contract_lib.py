"""Shared normalize/hash helpers for the oracle-compare tools
(tools/drive_contract.py full gate, tools/check_queries.py spot-check).
Mirrors the driver's compare: sort columns by name, canonicalize
dtypes, sort rows, round(9), sha256 of the CSV."""

import datetime as dt
import hashlib

import pandas as pd


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object and s.map(
            lambda v: v is None
            or isinstance(v, (dt.date, dt.datetime))
        ).all() and s.notna().any():
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df.sort_values(
        by=list(df.columns), kind="mergesort"
    ).reset_index(drop=True)


def h(df):
    return hashlib.sha256(
        df.round(9).to_csv(index=False).encode()
    ).hexdigest()


def keyhash(df, cols):
    """Value hash of a rows-only query's exactly-reproduced columns
    (registry.ROWS_KEY_COLS): object cells go through repr so
    list-typed columns stay sortable/hashable."""
    sub = df[sorted(cols)].copy()
    for c in sub.columns:
        if sub[c].dtype == object:
            sub[c] = sub[c].map(repr)
    return h(normalize(sub))


def type_classes(df):
    """Per-column dtype classes, sorted by column name. int and float
    are SEPARATE classes — a bigint→double drift is a schema bug."""
    return [
        {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "time"}
        .get(df[c].dtype.kind, "obj")
        for c in sorted(df.columns)
    ]
