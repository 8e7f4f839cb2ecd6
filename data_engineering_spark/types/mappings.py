"""The engine's type system: three mapping tables + compat casts.

Reproduces the reference's type universe (SURVEY.md §1.2) as data:

1. MYSQL_TO_SPARK — MySQL column types → Spark DDL strings, from
   /root/reference/incremental_kafka_s3_cdc.py:44-82 (34 entries) and
   sanpshot_script.py:36-51. Semantics preserved deliberately:
   - decimal → decimal(38,2) (fixed precision, loses source scale — the
     reference's documented policy, :77)
   - boolean/tinyint/smallint → int compat (downstream engines that
     can't take bools, :47, :336-339)
   - json/enum/set/blob/binary/spatial → string (:60-76)
   - time → long (micros-of-day carrier, :69)
2. DEBEZIUM_TO_SPARK — Debezium JSON-schema primitive types → Spark
   DataType (typeMapping, :151-170).
3. DEBEZIUM_SEMANTIC — Debezium semantic type names → conversion kind,
   applied post-parse (:222-238; implementations in
   functions/temporal.py).

Unknown types default to string — schema inference is total (:201-205).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- 1. MySQL → Spark/Iceberg DDL type strings -----------------------------
MYSQL_TO_SPARK: dict[str, str] = {
    # integers
    "tinyint": "int",
    "smallint": "int",
    "mediumint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "year": "int",
    # booleans → int (compat: reference :47)
    "boolean": "int",
    "bool": "int",
    "bit": "int",
    # floating / fixed point
    "float": "float",
    "double": "double",
    "real": "double",
    "decimal": "decimal(38,2)",
    "numeric": "decimal(38,2)",
    # temporal
    "date": "date",
    "datetime": "timestamp",
    "timestamp": "timestamp",
    "time": "bigint",
    # strings
    "char": "string",
    "varchar": "string",
    "tinytext": "string",
    "text": "string",
    "mediumtext": "string",
    "longtext": "string",
    # serialized / binary → string (reference :60-67)
    "json": "string",
    "enum": "string",
    "set": "string",
    "blob": "string",
    "tinyblob": "string",
    "mediumblob": "string",
    "longblob": "string",
    "binary": "string",
    "varbinary": "string",
    # spatial → string (reference :68-76)
    "geometry": "string",
    "point": "string",
    "linestring": "string",
    "polygon": "string",
    "multipoint": "string",
    "multilinestring": "string",
    "multipolygon": "string",
    "geometrycollection": "string",
}

DEFAULT_SPARK_TYPE = "string"


def mysql_type_to_spark(mysql_type: str) -> str:
    """Map a MySQL type (possibly with parameters, e.g. ``varchar(255)``,
    ``decimal(20,2) unsigned``) to a Spark DDL type string. Total: unknown
    types → string.

    ``unsigned`` integers widen one tier: MySQL's unsigned upper half
    does not fit the signed Spark type of the same width (an
    'int unsigned' auto-increment id past 2^31 would overflow a Spark
    int), so int unsigned → bigint and bigint unsigned → decimal(20,0)
    — the JDBC driver's own convention."""
    lowered = mysql_type.strip().lower()
    head = lowered.split("(")[0].split()
    if not head:  # degenerate input like "(5,2)" — inference stays total
        return DEFAULT_SPARK_TYPE
    base = MYSQL_TO_SPARK.get(head[0], DEFAULT_SPARK_TYPE)
    if "unsigned" in lowered.replace("(", " ").replace(")", " ").split():
        # widen by SOURCE type: tinyint/smallint/mediumint unsigned
        # still fit a Spark int, so only the top two tiers move
        widen = {
            "int": "bigint",
            "integer": "bigint",
            "bigint": "decimal(20,0)",
        }
        return widen.get(head[0], base)
    return base


# --- 2. Debezium JSON-schema primitive → Spark DataType --------------------
DEBEZIUM_TO_SPARK: dict[str, T.DataType] = {
    "int8": T.ShortType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "bytes": T.StringType(),
    "binary": T.StringType(),
}


def debezium_type_to_spark(dbz_type: str) -> T.DataType:
    return DEBEZIUM_TO_SPARK.get(dbz_type.lower(), T.StringType())


# --- 3. Debezium semantic (named) types → conversion kind ------------------
# kind is consumed by cdc/envelope.py, conversions in functions/temporal.py
DEBEZIUM_SEMANTIC: dict[str, str] = {
    "io.debezium.time.date": "epoch_days_date",
    "io.debezium.time.timestamp": "epoch_millis_ts",
    "io.debezium.time.microtimestamp": "epoch_micros_ts",
    "io.debezium.time.microtime": "micros_of_day",
    "io.debezium.time.time": "millis_of_day",
    "io.debezium.time.zonedtimestamp": "zoned_string_ts",
    "io.debezium.time.year": "int_passthrough",
    "org.apache.kafka.connect.data.decimal": "decimal",
    "org.apache.kafka.connect.data.date": "epoch_days_date",
    "org.apache.kafka.connect.data.timestamp": "epoch_millis_ts",
    "io.debezium.data.json": "string_passthrough",
    "io.debezium.data.enum": "string_passthrough",
    "io.debezium.data.enumset": "string_passthrough",
}

# Spark DDL type each semantic kind materializes as (partition-DDL mapping,
# reference typeMappingForPartition :171-193)
SEMANTIC_KIND_DDL: dict[str, str] = {
    "epoch_days_date": "date",
    "epoch_millis_ts": "timestamp",
    "epoch_micros_ts": "timestamp",
    "micros_of_day": "bigint",
    "millis_of_day": "bigint",
    "zoned_string_ts": "timestamp",
    "int_passthrough": "int",
    "decimal": "decimal(38,2)",
    "string_passthrough": "string",
}
