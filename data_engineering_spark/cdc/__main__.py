"""CDC ingest entry point — the spark-submit twin of the reference's
``incremental_kafka_s3_cdc.py`` main (:425-462).

    spark-submit -m data_engineering_spark.cdc \
        --lake-root /data/lake \
        --kafka localhost:9092 \
        --pattern 'source_glaucus1.oms1.*' \
        --checkpoint /data/ckpt [--once]

Without ``--kafka`` the source is a file stream of envelope parquet
(key/value/__topic/__table/__op/__ts_ms/__db columns) under
``--envelope-dir`` — the Kafka-less mode this container can actually
run; the downstream pipeline is identical.
"""

from __future__ import annotations

import argparse

from data_engineering_spark.cdc.pipeline import CdcEngine, LakeConfig
from data_engineering_spark.session import get_session
from data_engineering_spark.streaming.runner import (
    kafka_stream,
    run_cdc_stream,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="data_engineering_spark.cdc")
    p.add_argument("--lake-root", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--kafka", help="bootstrap servers (Kafka mode)")
    p.add_argument("--pattern", help="topic subscribe pattern (Kafka mode)")
    p.add_argument(
        "--envelope-dir", help="parquet envelope stream dir (file mode)"
    )
    p.add_argument(
        "--once",
        action="store_true",
        help="run-to-drain (availableNow) instead of continuous",
    )
    p.add_argument("--ts-guard", action="store_true")
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    spark = get_session(app_name="cdc-ingest")
    engine = CdcEngine(
        spark,
        LakeConfig(root=args.lake_root, ts_guard=args.ts_guard),
    )
    if args.kafka:
        if not args.pattern:
            raise SystemExit("--pattern is required with --kafka")
        source = kafka_stream(spark, args.kafka, args.pattern)
        from_kafka = True
    else:
        if not args.envelope_dir:
            raise SystemExit("--envelope-dir is required without --kafka")
        source = (
            spark.readStream.schema(
                "key string, value string, __topic string, __table string,"
                " __op string, __ts_ms long, __db string"
            ).parquet(args.envelope_dir)
        )
        from_kafka = False
    q = run_cdc_stream(
        engine,
        source,
        checkpoint_dir=args.checkpoint,
        available_now=args.once,
        raw_kafka=from_kafka,
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()
