"""WebDataset-style tar-shard ingestion.

Large multimodal training corpora ship as numbered `.tar` shards whose
members follow the `key.ext` convention (`000123.jpg`, `000123.json`,
`000123.txt` = one sample) — the WebDataset layout. Spark has no tar
source; this one composes from primitives without inventing a
connector:

- `spark.read.format("binaryFile")` lists and reads whole shards with
  normal partition parallelism (one task per shard — shards are sized
  for that by construction, typically 100 MB-1 GB);
- an Arrow-batched `mapInPandas` walks each tar IN the executor with
  stdlib `tarfile` and emits (shard, member, payload, size) rows —
  payload bytes never route through the driver and never shuffle
  unless the caller asks for grouping;
- `webdataset_records` folds member rows into one row per SAMPLE key
  with a `ext -> payload` map — the shape a training ingest consumes.

Scale notes: the member explosion is a narrow map (no shuffle);
grouping shuffles (key, member) pairs only for the samples requested
after pruning. Filter on `member`/extension BEFORE `webdataset_records`
to drop unwanted modalities while they are still column-pruned rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tar_members(
    spark: SparkSession,
    path: str,
    member_glob: str | None = None,
) -> DataFrame:
    """(shard string, member string, payload binary, size long) — one
    row per regular file across every tar shard matched by `path`
    (a file, directory, or glob, per binaryFile semantics).
    `member_glob` pre-filters member names executor-side (fnmatch),
    e.g. ``"*.txt"`` skips decoding payloads that would be dropped."""
    import fnmatch
    import io
    import tarfile

    import pandas as pd

    shards = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        if member_glob and not fnmatch.fnmatch(
                            m.name, member_glob
                        ):
                            continue
                        fh = tf.extractfile(m)
                        rows.append((p, m.name, fh.read(), m.size))
            yield pd.DataFrame(
                rows, columns=["shard", "member", "payload", "size"]
            )

    return shards.mapInPandas(
        extract, "shard string, member string, payload binary, size long"
    )


def webdataset_records(members: DataFrame) -> DataFrame:
    """Fold member rows into one row per sample: (shard, key,
    parts map<string, binary>, n_parts) where key is the member name
    up to the first dot and the map keys are the remaining extension
    (WebDataset's `key.ext` convention; nested dirs stay in the key).
    One shuffle on (shard, key)."""
    keyed = members.select(
        "shard",
        F.regexp_extract("member", r"^(.*?)\.([^/]*)$", 1).alias("key"),
        F.regexp_extract("member", r"^(.*?)\.([^/]*)$", 2).alias("ext"),
        "payload",
    ).filter(F.col("ext") != "")
    return (
        keyed.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("ext", "payload"))
            ).alias("parts"),
            F.count(F.lit(1)).cast("int").alias("n_parts"),
        )
    )
