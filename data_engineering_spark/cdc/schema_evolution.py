"""Schema evolution & partition-spec inference.

Reproduces the reference's reconciliation of per-batch inferred schemas
against the live table (SURVEY.md §1.3):

- columns new in the batch → add to table (ALTER TABLE ADD COLUMN,
  incremental_kafka_s3_cdc.py:304-309 / sanpshot_script.py:52-57); in
  the parquet-core backend new columns flow through merge_frames'
  union-of-columns output and old rows read as NULL.
- columns missing from the batch → NULL back-fill (reference :96-102) —
  the schema-alignment half of ``unionByName(allowMissingColumns=True)``.
- partition-spec inference (reference :212-213, :145-147): the first
  non-nullable date/timestamp column whose name contains "create"
  partitions by MONTH; otherwise fall back to the tenant/system column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def diff_columns(
    batch_columns: list[str], table_columns: list[str]
) -> tuple[list[str], list[str]]:
    """(columns to add to table, columns to back-fill in batch) — the
    reference's two set-differences (:304-309, :96-102), order-stable."""
    table_set, batch_set = set(table_columns), set(batch_columns)
    to_add = [c for c in batch_columns if c not in table_set]
    to_backfill = [c for c in table_columns if c not in batch_set]
    return to_add, to_backfill


def align_batch(
    batch: DataFrame,
    table_columns: list[str],
    table_schema=None,
) -> DataFrame:
    """Project batch to table schema ∪ batch schema: table columns first
    (NULL where the batch lacks them), then genuinely new columns.

    Pass `table_schema` (a StructType) when available: back-filled
    NULLs then carry the table's real column types. Without it they
    fall back to string — an UNTYPED F.lit(None) is Spark's void type,
    which parquet refuses to write ('does not support void data type')
    and which poisons downstream schema comparisons."""
    _, backfill = diff_columns(batch.columns, table_columns)
    types = (
        {f.name: f.dataType for f in table_schema.fields}
        if table_schema is not None
        else {}
    )

    def null_as(c: str):
        return F.lit(None).cast(types.get(c, "string")).alias(c)

    cols = [
        F.col(c) if c not in backfill else null_as(c)
        for c in table_columns
    ]
    new = [F.col(c) for c in batch.columns if c not in table_columns]
    return batch.select(*cols, *new)


@dataclass
class PartitionSpec:
    column: str
    transform: str | None  # 'months' | 'years' | 'days' | 'hours' | 'bucket' | None

    def to_ddl(self) -> str:
        if self.transform:
            return f"{self.transform}({self.column})"
        return self.column


# transforms the reference recognizes when reading specs back (:36-42)
KNOWN_TRANSFORMS = ("months", "years", "days", "hours", "bucket")


def infer_partition_spec(
    schema: T.StructType,
    fallback_column: str = "__rds_id",
) -> PartitionSpec:
    """First non-nullable 'create'-named date/timestamp column → monthly
    partitions; else identity-partition on the system fallback
    (reference :212-213 → :145-147; snapshot uses __tenant_id,
    sanpshot_script.py:184)."""
    for f in schema.fields:
        if (
            not f.nullable
            and "create" in f.name.lower()
            and isinstance(f.dataType, (T.DateType, T.TimestampType, T.TimestampNTZType))
        ):
            return PartitionSpec(f.name, "months")
    return PartitionSpec(fallback_column, None)


def parse_partition_spec(ddl: str) -> PartitionSpec:
    """Parse ``months(col)`` / ``col`` partition DDL back into a spec
    (reference get_partition_key_and_function, :104-124)."""
    s = ddl.strip()
    for t in KNOWN_TRANSFORMS:
        if s.lower().startswith(f"{t}(") and s.endswith(")"):
            return PartitionSpec(s[len(t) + 1 : -1].strip(), t)
    return PartitionSpec(s, None)


def partition_transform_column(spec: PartitionSpec) -> F.Column:
    """The materialized partition value for the parquet backend (Iceberg
    applies transforms natively; parquet needs an explicit column)."""
    c = F.col(spec.column)
    if spec.transform == "months":
        return F.date_format(c, "yyyy-MM")
    if spec.transform == "years":
        return F.date_format(c, "yyyy")
    if spec.transform == "days":
        return F.date_format(c, "yyyy-MM-dd")
    if spec.transform == "hours":
        return F.date_format(c, "yyyy-MM-dd-HH")
    if spec.transform == "bucket":
        return F.pmod(F.hash(c), F.lit(16))
    return c


# ---------------------------------------------------------------------------
# type widening (promotion lattice)
# ---------------------------------------------------------------------------

_INT_ORDER = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_ORDER = (T.FloatType, T.DoubleType)


def widen_type(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """Least common WIDER type for a changed column, or None when the
    change is not a safe promotion (string→int, struct reshape, …).
    Lattice: byte<short<int<long; float<double; mixing the integer and
    float families promotes to double (standard SQL numeric promotion —
    longs above 2^53 lose precision exactly as they would in any SQL
    engine's DOUBLE arithmetic); decimals widen to the max scale plus
    enough integer digits for both, capped at precision 38."""
    if a == b:
        return a
    if isinstance(a, _INT_ORDER) and isinstance(b, _INT_ORDER):
        ia, ib = _INT_ORDER.index(type(a)), _INT_ORDER.index(type(b))
        return _INT_ORDER[max(ia, ib)]()
    if isinstance(a, _FLOAT_ORDER) and isinstance(b, _FLOAT_ORDER):
        return T.DoubleType()
    if isinstance(a, (*_INT_ORDER, *_FLOAT_ORDER)) and isinstance(
        b, (*_INT_ORDER, *_FLOAT_ORDER)
    ):
        return T.DoubleType()
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        scale = max(a.scale, b.scale)
        ints = max(a.precision - a.scale, b.precision - b.scale)
        return T.DecimalType(min(38, ints + scale), scale)
    return None


def reconcile_types(
    source_schema: T.StructType, target_schema: T.StructType
) -> dict[str, T.DataType]:
    """For every column the batch and the table share with DIFFERENT
    types, the widened type both sides must cast to. Raises on an
    unpromotable change — silently coercing (or failing deep inside a
    union) is how lakes corrupt; the error names the column."""
    tgt = {f.name: f.dataType for f in target_schema.fields}
    out: dict[str, T.DataType] = {}
    for f in source_schema.fields:
        if f.name not in tgt or f.dataType == tgt[f.name]:
            continue
        w = widen_type(f.dataType, tgt[f.name])
        if w is None:
            raise TypeError(
                f"column '{f.name}': incompatible type change "
                f"{tgt[f.name].simpleString()} -> "
                f"{f.dataType.simpleString()}"
            )
        out[f.name] = w
    return out


def compat_report(
    old: T.StructType, new: T.StructType
) -> list[tuple[str, str, str]]:
    """Classify every difference between two schema VERSIONS for
    consumers of the table — the pre-flight a registry runs before
    letting a producer publish `new` over `old`:

    (column, change, severity) with severity:
    - 'safe':     added nullable column; widening promotion
      (int→long, float→double, decimal growth — old readers' values
      are representable)
    - 'warning':  added NON-nullable column (old writers cannot
      produce it; readers are fine)
    - 'breaking': dropped column, unpromotable type change, or
      nullable→required tightening

    Pure metadata, mirrors widen_type's lattice so the verdicts agree
    with what merge_frames would actually do at ingest time.
    """
    o = {f.name: f for f in old.fields}
    n = {f.name: f for f in new.fields}
    out: list[tuple[str, str, str]] = []
    for name, f in n.items():
        if name not in o:
            out.append(
                (
                    name,
                    f"added {f.dataType.simpleString()}",
                    "safe" if f.nullable else "warning",
                )
            )
            continue
        prev = o[name]
        if f.dataType != prev.dataType:
            w = widen_type(prev.dataType, f.dataType)
            change = (
                f"{prev.dataType.simpleString()} -> "
                f"{f.dataType.simpleString()}"
            )
            if w == f.dataType:
                out.append((name, f"widened {change}", "safe"))
            else:
                out.append((name, f"type change {change}", "breaking"))
        if prev.nullable and not f.nullable:
            out.append((name, "nullable -> required", "breaking"))
    for name in o:
        if name not in n:
            out.append((name, "dropped", "breaking"))
    return out
