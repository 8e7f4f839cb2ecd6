"""Structured-Streaming shell around the CDC batch pipeline.

Parity surface for the reference's streaming entry
(/root/reference/incremental_kafka_s3_cdc.py:360-388, 425-462):

- Kafka source by subscribe-pattern with headers, earliest offsets,
  failOnDataLoss=false (S1).
- ``foreachBatch`` sink with per-stream checkpoint dirs and a
  run-to-drain trigger — the reference's ``trigger(once=True)`` is
  deprecated; ``availableNow`` is the modern equivalent with the same
  exactly-once-via-checkpoint contract (K1).
- The reference runs up to 40 streams in one session via a thread pool
  (:452-460); ``start_streams`` reproduces that but the default is ONE
  stream over a multi-table pattern + per-table dispatch inside the
  batch (fewer checkpoints, one Kafka group, same semantics).

No Kafka in the test environment: everything downstream of the source
is a function of a static envelope frame, so tests drive
``CdcEngine.process_batch`` directly (SURVEY.md §7 step 6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from data_engineering_spark.cdc.envelope import extract_kafka_headers
from data_engineering_spark.cdc.pipeline import CdcEngine

KAFKA_DEFAULTS = {
    "startingOffsets": "earliest",
    "failOnDataLoss": "false",
    "includeHeaders": "true",
    # reference :368 — long fetch wait tolerates idle topics
    "kafka.fetch.max.wait.ms": "100000",
}


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str,
    options: dict[str, str] | None = None,
    max_offsets_per_trigger: int | None = 5_000_000,
) -> DataFrame:
    """Streaming Kafka scan by topic regex (reference read_from_kafka,
    :360-371 — the ``$``-anchored pattern is preserved).

    ``max_offsets_per_trigger`` bounds each micro-batch (records per
    trigger across all matched partitions). The reference's
    run-to-drain trigger (:387) with NO bound makes the first
    micro-batch after downtime the ENTIRE backlog — at 100 TB that is
    one giant shuffle that spills or OOMs. availableNow + a bound
    drains the same backlog as a sequence of right-sized batches with
    identical exactly-once semantics, so a bound is the default here
    and opting OUT (None) is the explicit choice."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", f"{subscribe_pattern}$")
    )
    opts = {**KAFKA_DEFAULTS, **(options or {})}
    if max_offsets_per_trigger is not None:
        opts.setdefault("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def file_envelope_stream(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source twin of `kafka_stream` (archived-envelope replay and
    the brokerless test path). ``max_files_per_trigger`` is the file
    source's batch bound — with size-bounded landing files this bounds
    rows per micro-batch the same way maxOffsetsPerTrigger does for
    Kafka, and the bound survives checkpoint restarts (it is a source
    option, not checkpoint state)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def run_cdc_stream(
    engine: CdcEngine,
    stream_df: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
    raw_kafka: bool = True,
) -> StreamingQuery:
    """Wire a streaming frame into the CDC engine. `raw_kafka=True`
    expects the Kafka wire schema and extracts headers as part of the
    streaming projection (stays incremental); `raw_kafka=False` accepts
    an already-extracted envelope stream (e.g. a file-source replay of
    archived envelopes — also how the integration tests drive this
    without brokers). The batch body is the tested
    CdcEngine.process_batch."""
    envelope = extract_kafka_headers(stream_df) if raw_kafka else stream_df

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        engine.process_batch(batch_df, batch_id)

    writer = (
        envelope.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink)
    )
    writer = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="10 seconds")
    )
    return writer.start()


def start_streams(
    engine: CdcEngine,
    spark: SparkSession,
    bootstrap_servers: str,
    patterns: Sequence[str],
    checkpoint_root: str,
    max_concurrent: int = 40,
    max_offsets_per_trigger: int | None = 5_000_000,
) -> list[StreamingQuery]:
    """One stream per pattern (reference main loop :437-460). Streams
    are async by nature — no thread pool needed; Spark schedules the
    micro-batches. `max_concurrent` kept for parity/documentation."""
    queries = []
    for i, pattern in enumerate(patterns[: max_concurrent or None]):
        q = run_cdc_stream(
            engine,
            kafka_stream(
                spark,
                bootstrap_servers,
                pattern,
                max_offsets_per_trigger=max_offsets_per_trigger,
            ),
            checkpoint_dir=f"{checkpoint_root}/{i}",
        )
        queries.append(q)
    return queries


def idempotent_sink(sink_fn, ledger_path: str):
    """Make a foreachBatch body exactly-once against NON-transactional
    targets (plain files, JDBC without upsert keys, HTTP...).

    Structured Streaming's contract is at-least-once per micro-batch:
    after a crash between the sink's side effect and the checkpoint
    commit, the SAME (batch_id, data) is re-delivered. Keyed MERGE
    sinks absorb that by idempotence; for sinks that don't, this
    wrapper consults a batch-id ledger (one tiny marker file per
    committed batch — the same trick Spark's own file sink plays with
    _spark_metadata) and skips batches it already applied. Marker
    write happens AFTER the sink succeeds; a crash in between means
    one more replay, never a skip of an unapplied batch."""
    import os

    def _wrapped(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(ledger_path, exist_ok=True)
        marker = os.path.join(ledger_path, f"batch-{batch_id:020d}")
        if os.path.exists(marker):
            return  # replay of an already-committed batch
        sink_fn(batch_df, batch_id)
        with open(marker, "w") as f:
            f.write("committed\n")

    return _wrapped
