"""Debezium CDC envelope parsing & dynamic schema inference.

Re-implements the reference's streaming-side schema machinery
(/root/reference/incremental_kafka_s3_cdc.py:150-241, 294-302, 360-383)
declaratively:

- Kafka wire shape (FIXTURES.md A3): record key = JSON of PK fields;
  record value = ``{"schema": {...}, "payload": {...}}``
  (JsonConverter with schemas.enable=true); headers (fixed order, from
  ``transforms.unwrap.add.headers=table,op,source.ts_ms,source.db``,
  mysql-connector.json:21) = [table, op, ts_ms, db].
- The embedded Debezium schema is converted to a Spark StructType plus a
  per-column semantic-conversion map (mappings.DEBEZIUM_SEMANTIC); the
  payload is parsed with ``from_json`` ×2 and flattened; semantic
  temporal/decimal columns converted via functions/temporal.py.
- No RDD round-trip: the reference's ``createDataFrame(df.rdd, schema)``
  (:221) is replaced by typed ``from_json`` + per-column casts, keeping
  whole-stage codegen alive.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_spark.functions import temporal as tmp
from data_engineering_spark.types.casts import sanitize_column_name
from data_engineering_spark.types.mappings import (
    DEBEZIUM_SEMANTIC,
    debezium_type_to_spark,
)

SYSTEM_COLUMNS = (
    "__op",
    "__table",
    "__db",
    "__topic",
    "__ts_ms",
    "__tenant_id",
    "__rds_id",
    "__dp_update_ts",
)


@dataclass
class InferredSchema:
    """Outcome of envelope-schema inference for one table batch.

    `struct` carries WIRE types (what from_json parses — Debezium sends
    semantic temporal values as int64); `converted_struct` carries the
    post-conversion logical types (timestamp/date/decimal) — partition
    inference and DDL use the latter (reference builds its DDL from
    typeMappingForPartition, :171-193, the converted view)."""

    struct: T.StructType
    semantic: dict[str, str] = field(default_factory=dict)  # col → kind
    key_columns: list[str] = field(default_factory=list)

    @property
    def converted_struct(self) -> T.StructType:
        from data_engineering_spark.types.mappings import SEMANTIC_KIND_DDL

        ddl_to_type = {
            "date": T.DateType(),
            "timestamp": T.TimestampType(),
            "bigint": T.LongType(),
            "int": T.IntegerType(),
            "decimal(38,2)": T.DecimalType(38, 2),
            "string": T.StringType(),
        }
        fields = []
        for f in self.struct.fields:
            kind = self.semantic.get(f.name)
            dtype = (
                ddl_to_type[SEMANTIC_KIND_DDL[kind]] if kind else f.dataType
            )
            fields.append(T.StructField(f.name, dtype, f.nullable))
        return T.StructType(fields)


def infer_from_envelope_schema(
    schema_json: str | dict,
    key_json: str | dict | None = None,
) -> InferredSchema:
    """Build a Spark schema from a Debezium embedded JSON schema.

    Mirrors schema_setter's inference (:196-213): every field gets a
    type (unknown → string, inference is total); fields named by a
    Debezium semantic type are carried as their wire primitive and
    tagged for post-parse conversion; key columns (from the record key
    JSON) become non-nullable.

    Note the reference takes only the FIRST key field (:317) — composite
    PKs are truncated. We keep every key field (documented deviation:
    correctness over parity; merge keys must cover the full PK).
    """
    schema = (
        json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    )
    if "schema" in schema:
        schema = schema["schema"]
    keys: list[str] = []
    if key_json is not None:
        key_obj = (
            json.loads(key_json) if isinstance(key_json, str) else key_json
        )
        keys = [sanitize_column_name(k) for k in key_obj]

    fields: list[T.StructField] = []
    semantic: dict[str, str] = {}
    for f in schema.get("fields", []):
        name = sanitize_column_name(f["field"])
        sem_name = (f.get("name") or "").lower()
        kind = DEBEZIUM_SEMANTIC.get(sem_name)
        if kind == "decimal":
            # precise-mode decimals carry their scale in the connect
            # schema parameters; it rides inside the kind tag so the
            # conversion can reconstruct the logical value
            scale = (f.get("parameters") or {}).get("scale", "2")
            kind = f"decimal:{int(scale)}"
        if kind:
            semantic[name] = kind
        dtype = debezium_type_to_spark(f.get("type", "string"))
        nullable = bool(f.get("optional", True)) and name not in keys
        fields.append(T.StructField(name, dtype, nullable))
    return InferredSchema(T.StructType(fields), semantic, keys)


def _decode_precise_decimal(col: str, scale: int) -> Column:
    """org.apache.kafka.connect.data.Decimal wire → decimal(38,scale).

    try_to_binary keeps malformed payloads NULL (quarantine philosophy)
    instead of erroring under ANSI mode; the byte fold supports
    unscaled magnitudes up to decimal(38,0) — far past the 8-byte limit
    a conv()-only decode would silently wrap at."""
    h = F.hex(F.expr(f"try_to_binary({col}, 'base64')"))
    nb = (F.length(h) / F.lit(2)).cast("int")
    seq = F.sequence(F.lit(1), nb)
    unscaled = F.aggregate(
        seq,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, i: acc * 256
        + F.conv(F.substring(h, i * 2 - 1, F.lit(2)), 16, 10).cast(
            "decimal(38,0)"
        ),
    )
    pow_n = F.aggregate(
        seq,
        F.lit(1).cast("decimal(38,0)"),
        lambda acc, _: acc * 256,
    )
    signed = F.when(
        F.conv(F.substring(h, F.lit(1), F.lit(2)), 16, 10).cast("int")
        >= 128,
        unscaled - pow_n,
    ).otherwise(unscaled)
    return F.when(
        nb >= 1, (signed / F.lit(10 ** scale)).cast(f"decimal(38,{scale})")
    )


def apply_semantic_conversions(
    df: DataFrame, semantic: dict[str, str]
) -> DataFrame:
    """Convert Debezium semantic wire values to their logical types
    (reference :222-238) — exact integer arithmetic, one projection."""
    convert: dict[str, Column] = {}
    for col, kind in semantic.items():
        if col not in df.columns:
            continue
        if kind == "epoch_days_date":
            convert[col] = tmp.epoch_days_to_date(col)
        elif kind == "epoch_millis_ts":
            convert[col] = tmp.epoch_millis_to_timestamp(col)
        elif kind == "epoch_micros_ts":
            convert[col] = tmp.epoch_micros_to_timestamp(col)
        elif kind == "micros_of_day":
            convert[col] = F.col(col).cast("long")
        elif kind == "millis_of_day":
            convert[col] = F.col(col).cast("long")
        elif kind == "zoned_string_ts":
            convert[col] = tmp.zoned_string_to_timestamp(col)
        elif kind.startswith("decimal"):
            # Debezium precise mode (the default) ships decimals as a
            # base64 string of the UNSCALED value's big-endian
            # two's-complement bytes — a bare cast('decimal') of that
            # string is NULL for every row (silent loss of the whole
            # column). Decode exactly, JVM-side: bytes → unscaled
            # decimal(38,0) via a per-byte aggregate, sign-adjust when
            # the top bit is set, divide by 10^scale (the scale rides
            # in the kind tag from the connect schema parameters).
            # Reference intent at :234-236 (its `.cast(DecimalType())`
            # is applied to the wrong object — a latent bug).
            scale = int(kind.split(":")[1]) if ":" in kind else 2
            convert[col] = _decode_precise_decimal(col, scale)
        elif kind == "int_passthrough":
            convert[col] = F.col(col).cast("int")
        else:  # string_passthrough
            convert[col] = F.col(col).cast("string")
    if not convert:
        return df
    return df.select(
        *[convert.get(c, F.col(c)).alias(c) for c in df.columns]
    )


def parse_envelope_batch(
    raw: DataFrame, inferred: InferredSchema
) -> DataFrame:
    """Parse a batch of envelope rows into typed columns.

    `raw` carries string columns ``key``/``value`` plus the header-derived
    system columns (__op/__table/__db/__topic/__ts_ms). The value is the
    full ``{schema, payload}`` envelope; we parse the outer envelope with
    a static 2-field struct, then the payload with the inferred schema —
    from_json ×2 exactly as the reference (:214-215) but fully typed.
    """
    sys_cols = [c for c in raw.columns if c.startswith("__")]
    parsed = raw.select(
        F.from_json(
            F.get_json_object(F.col("value"), "$.payload"),
            inferred.struct,
        ).alias("payload"),
        *[F.col(c) for c in sys_cols],
    ).select(F.col("payload.*"), *[F.col(c) for c in sys_cols])
    return apply_semantic_conversions(parsed, inferred.semantic)


def batch_table_schemas(
    raw: DataFrame,
) -> dict[str, tuple[str | None, str | None]]:
    """Per-table (key_json, schema_json) discovery for a WHOLE batch in
    ONE aggregation action: {__table: latest_envelope_schema(slice)}.

    Same candidate rules as latest_envelope_schema (the per-slice
    variant, kept for single-table callers), with the parseable-schema
    filter folded into max_by's ordering expression — max_by ignores
    rows whose ordering value is NULL, so `when(ok, ts)` IS the filter.
    Every table with at least one batch row gets an entry (a table
    whose rows are all malformed maps to (None, None) — the caller's
    undiscoverable-early-return, unchanged).

    Why: per-batch driver actions serialize across concurrent streams;
    the previous shape paid one distinct-tables collect plus one
    aggregate collect PER TABLE (1 + N jobs per batch) — this is the
    same information in exactly one job, whatever the table count.
    """
    ok = F.get_json_object("value", "$.schema.fields[0]").isNotNull()
    rows = (
        raw.select("__table", "key", "value", "__ts_ms")
        .groupBy("__table")
        .agg(
            F.max_by(
                "key",
                F.when(ok & F.col("key").isNotNull(), F.col("__ts_ms")),
            ).alias("key"),
            F.max_by(
                "value", F.when(ok, F.col("__ts_ms"))
            ).alias("value"),
        )
        .collect()
    )
    return {
        r["__table"]: (r["key"], _schema_json_of(r["value"]))
        for r in rows
    }


def _schema_json_of(value: str | None) -> str | None:
    """The envelope's schema member as canonical JSON, None when the
    value is missing or unparseable (shared by both discovery paths)."""
    if value is None:
        return None
    try:
        return json.dumps(json.loads(value).get("schema"))
    except (ValueError, AttributeError):
        return None


def latest_envelope_schema(raw: DataFrame) -> tuple[str | None, str | None]:
    """Driver-side discovery of the batch's schema & key JSON from the
    latest **parseable** record (the reference uses ``tail(1)`` twice,
    :317/:326 — two full-scan actions; we take both fields in ONE
    action, ordered by event time so 'latest' is deterministic, not
    partition-positional).

    Rows whose value is not a JSON object carrying a `schema` member
    are skipped BEFORE picking the latest — otherwise one malformed
    message at the head of the batch would make the whole table slice
    undiscoverable (and un-quarantinable, since quarantine runs after
    schema inference). The filter is a JVM-side get_json_object probe,
    not a driver loop.

    The key payload is taken from the latest record whose key is SET
    (max_by ignores NULL ordering values): the key schema defines the
    table's merge identity, and a flaky producer dropping the message
    key on the newest record must not silently demote a keyed table to
    keyless appends. The value schema still comes from the latest
    record overall. Both ride ONE aggregate action."""
    # `$.schema.fields[0]` (not just `$.schema`): a record carrying an
    # EMPTY or field-less schema object would win the latest-ts race
    # and yield a zero-field struct — every downstream column lookup
    # then dies with UNRESOLVED_COLUMN for the whole table slice
    # (found by the malformed-payload engine property). Only records
    # whose schema can actually type a payload are schema candidates;
    # field-less ones still flow to parse+quarantine like any other
    # malformed row.
    row = (
        raw.select("key", "value", "__ts_ms")
        .filter(
            F.get_json_object("value", "$.schema.fields[0]").isNotNull()
        )
        .agg(
            F.max_by(
                "key",
                F.when(F.col("key").isNotNull(), F.col("__ts_ms")),
            ).alias("key"),
            F.max_by("value", "__ts_ms").alias("value"),
        )
        .collect()
    )
    if not row or row[0]["value"] is None:
        return None, None
    return row[0]["key"], _schema_json_of(row[0]["value"])


def extract_kafka_headers(kafka_df: DataFrame) -> DataFrame:
    """Kafka frame → envelope frame: cast key/value, extract the four
    fixed-order headers into system columns (reference :376-383)."""
    return kafka_df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("topic").alias("__topic"),
        F.expr("headers[0].value").cast("string").alias("__table"),
        F.expr("headers[1].value").cast("string").alias("__op"),
        F.expr("headers[2].value").cast("string").cast("long").alias("__ts_ms"),
        F.expr("headers[3].value").cast("string").alias("__db"),
    )


def stamp_multitenant(df: DataFrame) -> DataFrame:
    """Add __tenant_id / __rds_id / __dp_update_ts system columns
    (reference :294-302, :331): tenant id = digits in the db name
    (default 0), rds id = digits in the topic's first segment."""
    tenant = F.coalesce(
        F.nullif(F.regexp_extract(F.col("__db"), r"(\d+)", 1), F.lit("")),
        F.lit("0"),
    ).cast("int")
    rds = F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.split(F.col("__topic"), r"\.").getItem(0), r"(\d+)", 1
            ),
            F.lit(""),
        ),
        F.lit("0"),
    ).cast("int")
    return (
        df.withColumn("__tenant_id", tenant)
        .withColumn("__rds_id", rds)
        .withColumn("__dp_update_ts", F.current_timestamp())
    )
