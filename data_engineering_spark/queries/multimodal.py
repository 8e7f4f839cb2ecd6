"""Multimodal-column queries (SURVEY.md §2.11).

The driver's tables carry no binary media, so the binary payload is
synthesized deterministically from document text (utf-8 encode). The
point is the operator plumbing — binary columns, metadata extraction,
Arrow-batched feature UDFs — not the bytes themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.multimodal import (
    byte_histogram_features,
    sample_frames,
    with_binary_metadata,
)
from data_engineering_spark.registry import query


def _binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )


@query(
    "q_multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_size,
           sha256(text) AS content_sha,
           'unknown' AS format
    FROM documents
    """,
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: size, content hash,
    magic-byte format sniff (text payloads sniff as 'unknown')."""
    b = with_binary_metadata(_binary_docs(spark, sf_dir))
    return b.select("doc_id", "byte_size", "content_sha", "format")


@query("q_multimodal_histogram")
def q_multimodal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (256-bin byte histogram) +
    downstream aggregation — the mapInPandas plumbing a real encoder
    uses. No SQL oracle (array output); pytest asserts the math."""
    feats = byte_histogram_features(
        _binary_docs(spark, sf_dir), id_col="doc_id"
    )
    # aggregate: mean mass in the ASCII-letter byte range per doc bucket
    letter_mass = F.expr(
        "aggregate(slice(features, 98, 25), 0D, (acc, x) -> acc + x)"
    )
    return feats.select(
        (F.col("id") % 10).alias("bucket"),
        letter_mass.alias("letter_mass"),
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("letter_mass"), 6).alias("avg_letter_mass"),
    )


@query("q_multimodal_frame_sample")
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out shape (1 payload → k binary frames)."""
    frames = sample_frames(
        _binary_docs(spark, sf_dir), id_col="doc_id",
        frame_size=64, stride=2,
    )
    return frames.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame")).alias("sampled_bytes"),
    )
