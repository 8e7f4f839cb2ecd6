"""Frame-level cast & sanitization utilities.

Reproduces the reference's compat behaviors as declarative per-column
casts (no RDD round-trip — the reference's
``createDataFrame(df.rdd, schema)`` at incremental_kafka_s3_cdc.py:221
breaks whole-stage codegen; ``Column.cast`` keeps the Catalyst/Arrow
path end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sanitize_column_name(name: str) -> str:
    """Strip, replace inner spaces with underscores, lowercase — the
    reference's column normalization (sanpshot_script.py:172,217-218)."""
    return name.strip().replace(" ", "_").lower()


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename every column through sanitize_column_name (single select —
    not a withColumnRenamed chain, which grows the logical plan
    quadratically on wide tables)."""
    return df.toDF(*[sanitize_column_name(c) for c in df.columns])


def compat_cast_booleans(df: DataFrame) -> DataFrame:
    """boolean/short → int, the reference's downstream-compat cast
    (incremental_kafka_s3_cdc.py:336-339; sanpshot_script.py:225-227)."""
    out = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.BooleanType, T.ShortType, T.ByteType)):
            out.append(F.col(f.name).cast("int").alias(f.name))
        else:
            out.append(F.col(f.name))
    return df.select(*out)


def cast_frame(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast df's columns to the target schema's types (by name; missing
    columns become typed NULLs, extra columns are dropped). The
    declarative replacement for the reference's RDD-based re-typing."""
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def align_to_columns(
    df: DataFrame, columns: list[str], schema=None
) -> DataFrame:
    """Project to exactly `columns`; absent ones are filled with NULL —
    the reference's dropped-column back-fill
    (incremental_kafka_s3_cdc.py:96-102; sanpshot_script.py:59-63).

    Pass `schema` (StructType of the target) for typed NULLs; without
    it missing columns fall back to string — an UNTYPED lit(None) is
    void, which parquet refuses to write, defeating the function's own
    append-to-existing-table purpose."""
    types = (
        {f.name: f.dataType for f in schema.fields}
        if schema is not None
        else {}
    )
    return df.select(
        *[
            F.col(c)
            if c in df.columns
            else F.lit(None).cast(types.get(c, "string")).alias(c)
            for c in columns
        ]
    )
