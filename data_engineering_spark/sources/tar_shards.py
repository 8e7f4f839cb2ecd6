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
    """(shard string, member string, payload binary, size long,
    offset long) — one row per regular file across every tar shard
    matched by `path` (a file, directory, or glob, per binaryFile
    semantics). `offset` is the member's byte position in its shard:
    tar update/append semantics make the LATER entry of a repeated
    name authoritative, and offset is the order witness grouping needs
    after a shuffle. `member_glob` pre-filters member names
    executor-side (fnmatch), e.g. ``"*.txt"`` skips decoding payloads
    that would be dropped."""
    import fnmatch
    import io
    import tarfile

    import pandas as pd

    shards = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def extract(batches):
        # one yield PER SHARD, not per Arrow batch: a batch can carry
        # several 100 MB-1 GB shards, and accumulating every shard's
        # extracted members on top of the batch's own tar bytes doubles
        # peak executor memory for no reason
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                rows = []
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        if member_glob and not fnmatch.fnmatch(
                            m.name, member_glob
                        ):
                            continue
                        fh = tf.extractfile(m)
                        rows.append(
                            (p, m.name, fh.read(), m.size, m.offset)
                        )
                yield pd.DataFrame(
                    rows,
                    columns=["shard", "member", "payload", "size", "offset"],
                )

    return shards.mapInPandas(
        extract,
        "shard string, member string, payload binary, size long, "
        "offset long",
    )


def webdataset_records(members: DataFrame) -> DataFrame:
    """Fold member rows into one row per sample: (shard, key,
    parts map<string, binary>, n_parts) where key is the member name
    up to the first dot and the map keys are the remaining extension
    (WebDataset's `key.ext` convention; nested dirs stay in the key).
    One shuffle on (shard, key).

    A repeated (key, ext) within a shard is legal tar (append/update
    writes a superseding entry) — and map_from_entries would THROW on
    the duplicate key (default EXCEPTION dedup policy), killing the
    job on one shard. Tar semantics say the later entry wins: entries
    sort by (ext, offset) inside the one aggregation and only the
    last offset per ext reaches the map — still a single shuffle
    (dedup is an array lambda, not a second groupBy)."""
    keyed = members.select(
        "shard",
        F.regexp_extract("member", r"^(.*?)\.([^/]*)$", 1).alias("key"),
        F.regexp_extract("member", r"^(.*?)\.([^/]*)$", 2).alias("ext"),
        "payload",
        "offset",
    ).filter(F.col("ext") != "")
    grouped = keyed.groupBy("shard", "key").agg(
        F.array_sort(
            F.collect_list(F.struct("ext", "offset", "payload"))
        ).alias("__entries")
    )
    last_per_ext = (
        "filter(__entries, (x, i) -> i = size(__entries) - 1 "
        "OR __entries[i + 1].ext != x.ext)"
    )
    return grouped.select(
        "shard",
        "key",
        F.map_from_entries(
            F.expr(
                f"transform({last_per_ext}, e -> struct(e.ext, e.payload))"
            )
        ).alias("parts"),
        F.expr(f"size({last_per_ext})").cast("int").alias("n_parts"),
    )
