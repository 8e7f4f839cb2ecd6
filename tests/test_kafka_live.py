"""Live-Kafka integration for the streaming source (VERDICT r7
missing-item 2: SURVEY §2 row S1's last env-gated evidence).

The sandbox has no Kafka broker or spark-sql-kafka jar, so this file
SKIPS cleanly here; in any environment with both it turns on with
zero code changes:

    # broker (e.g.): docker run -p 9092:9092 apache/kafka:3.9.0
    KAFKA_BOOTSTRAP=localhost:9092 \\
    KAFKA_JAR="$(ls jars/spark-sql-kafka-0-10_2.13-*.jar \\
                    jars/kafka-clients-*.jar \\
                    jars/spark-token-provider-kafka-0-10_2.13-*.jar \\
                    jars/commons-pool2-*.jar | paste -sd,)" \\
      python -m pytest tests/test_kafka_live.py -v
    # or resolve via --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2

Run STANDALONE (its SparkSession needs the connector jars on the
classpath at build time). Production (messages produced THROUGH Spark's
own kafka batch sink, so no extra client library is needed):

What it proves when it runs: `kafka_stream`'s exact reader options —
subscribePattern with the $ anchor, includeHeaders,
startingOffsets=earliest, maxOffsetsPerTrigger — against a real
broker, plus the four-fixed-header extraction
(cdc/envelope.extract_kafka_headers, reference
incremental_kafka_s3_cdc.py:360-383) on real wire records.
"""

from __future__ import annotations

import glob
import os
import uuid

import pytest


def _kafka_jars() -> str | None:
    env = os.environ.get("KAFKA_JAR")
    if env and all(os.path.exists(p) for p in env.split(",")):
        return env
    import pyspark

    roots = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    for root in roots:
        hits = glob.glob(os.path.join(root, "spark-sql-kafka-0-10*.jar"))
        if hits:
            # the runtime deps live in the same dir when installed there
            return ",".join(
                hits
                + glob.glob(os.path.join(root, "kafka-clients-*.jar"))
                + glob.glob(
                    os.path.join(root, "spark-token-provider-kafka*.jar")
                )
                + glob.glob(os.path.join(root, "commons-pool2-*.jar"))
            )
    return None


_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")
_JARS = _kafka_jars()

pytestmark = pytest.mark.skipif(
    not (_BOOTSTRAP and _JARS),
    reason=(
        "live Kafka evidence needs KAFKA_BOOTSTRAP pointing at a "
        "broker AND the spark-sql-kafka connector jars (KAFKA_JAR or "
        "$SPARK_HOME/jars) — see module docstring for the exact "
        "invocation"
    ),
)


@pytest.fixture(scope="module")
def kafka_spark():
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        yield active  # the connector is classpath-level; reuse works
        return
    s = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-live-tests")
        .config("spark.jars", _JARS)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _produce(spark, topic: str, rows):
    """Produce through Spark's own Kafka batch sink (headers included)
    — no python kafka client needed."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "key string, value string, table string, op string, "
        "ts_ms string, db string"
    ).select(
        "key",
        "value",
        F.array(
            F.struct(
                F.lit("__table").alias("key"),
                F.col("table").cast("binary").alias("value"),
            ),
            F.struct(
                F.lit("__op").alias("key"),
                F.col("op").cast("binary").alias("value"),
            ),
            F.struct(
                F.lit("__ts_ms").alias("key"),
                F.col("ts_ms").cast("binary").alias("value"),
            ),
            F.struct(
                F.lit("__db").alias("key"),
                F.col("db").cast("binary").alias("value"),
            ),
        ).alias("headers"),
    )
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", _BOOTSTRAP)
        .option("topic", topic)
        .option("includeHeaders", "true")
        .save()
    )


def test_pattern_scan_headers_and_batch_bound(kafka_spark, tmp_path):
    """End to end: two topics matching the subscribe pattern + one that
    must NOT match (the $ anchor), four-header extraction, earliest
    offsets, and the availableNow drain through a checkpointed
    foreachBatch."""
    from data_engineering_spark.cdc.envelope import (
        extract_kafka_headers,
    )
    from data_engineering_spark.streaming.runner import kafka_stream

    run = uuid.uuid4().hex[:8]
    t1, t2 = f"cdc{run}.db1.users", f"cdc{run}.db1.orders"
    decoy = f"cdc{run}.db1.users_archive"  # pattern-anchor decoy
    _produce(
        kafka_spark, t1,
        [("k1", "v1", "users", "c", "1000", "db1"),
         ("k2", "v2", "users", "u", "2000", "db1")],
    )
    _produce(
        kafka_spark, t2,
        [("k3", "v3", "orders", "c", "3000", "db7")],
    )
    _produce(
        kafka_spark, decoy,
        [("kx", "vx", "users", "d", "9000", "db1")],
    )

    stream = kafka_stream(
        kafka_spark,
        _BOOTSTRAP,
        subscribe_pattern=rf"cdc{run}\.db1\.(users|orders)",
        max_offsets_per_trigger=2,  # forces >1 micro-batch for 3 rows
    )
    out: list = []
    batches: list[int] = []

    def sink(batch_df, batch_id):
        rows = extract_kafka_headers(batch_df).collect()
        if rows:
            out.extend(rows)
            batches.append(batch_id)

    q = (
        stream.writeStream.option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["key"], r["value"], r["__table"], r["__op"], r["__ts_ms"],
         r["__db"], r["__topic"])
        for r in out
    }
    assert got == {
        ("k1", "v1", "users", "c", 1000, "db1", t1),
        ("k2", "v2", "users", "u", 2000, "db1", t1),
        ("k3", "v3", "orders", "c", 3000, "db7", t2),
    }  # decoy topic excluded by the $-anchored pattern
    assert len(batches) >= 2  # maxOffsetsPerTrigger honored


def test_checkpoint_restart_is_exactly_once(kafka_spark, tmp_path):
    """Drain, produce more, drain again from the SAME checkpoint: the
    second run must deliver only the new records."""
    from data_engineering_spark.streaming.runner import kafka_stream

    run = uuid.uuid4().hex[:8]
    topic = f"cdc{run}.db1.items"
    ckpt = str(tmp_path / "ckpt")
    seen: list[str] = []

    def drain():
        batch_keys: list[str] = []

        def sink(batch_df, _bid):
            batch_keys.extend(
                r["key"]
                for r in batch_df.selectExpr(
                    "CAST(key AS STRING) AS key"
                ).collect()
            )

        q = (
            kafka_stream(
                kafka_spark, _BOOTSTRAP, rf"cdc{run}\.db1\.items"
            )
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return batch_keys

    _produce(
        kafka_spark, topic, [("a", "1", "items", "c", "1", "db1")]
    )
    seen += drain()
    _produce(
        kafka_spark, topic, [("b", "2", "items", "c", "2", "db1")]
    )
    second = drain()
    assert seen == ["a"]
    assert second == ["b"]  # no replay of 'a'
