"""Synthesized Debezium CDC fixtures (FIXTURES.md A3).

Builds envelope frames in the exact wire shape the streaming side
produces after header extraction: string key/value JSON columns + the
four header-derived system columns.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("__topic", T.StringType()),
        T.StructField("__table", T.StringType()),
        T.StructField("__op", T.StringType()),
        T.StructField("__ts_ms", T.LongType()),
        T.StructField("__db", T.StringType()),
    ]
)

SALES_FIELDS = [
    {"field": "sale_id", "type": "int64", "optional": False},
    {"field": "item_id", "type": "int32", "optional": True},
    {"field": "price", "type": "float32", "optional": True},
]


def envelope(
    key: dict,
    payload: dict,
    op: str = "c",
    ts_ms: int = 1_700_000_000_000,
    table: str = "sales",
    db: str = "oms1",
    rds_id: int = 1,
    fields: list[dict] | None = None,
) -> tuple:
    """One CDC record in wire order (topic per FIXTURES.md A3:
    source_glaucus{rds}.{db}.{table})."""
    value = {
        "schema": {"type": "struct", "fields": fields or SALES_FIELDS},
        "payload": {**payload, "__deleted": "true" if op == "d" else "false"},
    }
    topic = f"source_glaucus{rds_id}.{db}.{table}"
    return (
        json.dumps(key),
        json.dumps(value),
        topic,
        table,
        op,
        ts_ms,
        db,
    )


def envelope_frame(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)


def sale(
    spark: SparkSession,
    sale_id: int,
    item_id: int,
    price: float,
    op: str = "c",
    ts_ms: int = 1_700_000_000_000,
    **kw,
) -> tuple:
    return envelope(
        {"sale_id": sale_id},
        {"sale_id": sale_id, "item_id": item_id, "price": price},
        op=op,
        ts_ms=ts_ms,
        **kw,
    )
