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


@query(
    "q_multimodal_histogram",
    oracle="""
    WITH d AS (
      SELECT doc_id % 10 AS bucket,
             length(regexp_replace(text, '[^a-y]', '', 'g')) AS lb,
             octet_length(encode(text)) AS tb
      FROM documents)
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM(lb) AS BIGINT) AS sum_letter_bytes,
           CAST(SUM(tb) AS BIGINT) AS sum_bytes,
           CAST(SUM(lb) AS DOUBLE) / CAST(SUM(tb) AS DOUBLE)
             AS letter_mass
    FROM d GROUP BY 1
    """,
)
def q_multimodal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (256-bin byte histogram) +
    downstream aggregation — the mapInPandas plumbing a real encoder
    uses. The query consumes exact integer counts (normalize=False) so
    every aggregate is order-independent and the oracle can recompute
    the byte ranges with regexp arithmetic; the division happens once
    on exact sums (bit-identical across engines). The normalized-float
    path is pytest-covered."""
    feats = byte_histogram_features(
        _binary_docs(spark, sf_dir), id_col="doc_id", normalize=False
    )
    # bins are 1-indexed: element 98 = byte 97 ('a') … element 122 =
    # byte 121 ('y') — the [a-y] ASCII range the oracle mirrors.
    letter_bytes = F.expr(
        "aggregate(slice(features, 98, 25), 0L, (acc, x) -> acc + x)"
    )
    total_bytes = F.expr("aggregate(features, 0L, (acc, x) -> acc + x)")
    return (
        feats.select(
            (F.col("id") % 10).alias("bucket"),
            letter_bytes.alias("lb"),
            total_bytes.alias("tb"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("lb").cast("bigint").alias("sum_letter_bytes"),
            F.sum("tb").cast("bigint").alias("sum_bytes"),
            (
                F.sum("lb").cast("double") / F.sum("tb").cast("double")
            ).alias("letter_mass"),
        )
    )


@query(
    "q_multimodal_decode",
    oracle="""
    WITH a AS (
      SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
      FROM documents),
    h AS (
      SELECT doc_id, t, LEAST(length(t) // 8, 32) AS hh
      FROM a WHERE length(t) >= 8)
    SELECT doc_id, 8 AS width, CAST(hh AS INT) AS height, 'L' AS mode,
           sha256(substr(t, 1, CAST(hh * 8 AS INT))) AS pixel_sha
    FROM h
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTABLE image decode (no media library): each document's
    printable-ASCII bytes become a synthetic 8-wide PGM (P5) payload;
    the numpy decoder recovers dimensions, mode and the exact pixel
    bytes, verified against the oracle via sha256 of the pixel buffer.
    The decode itself runs in mapInPandas over Arrow batches — binary
    in, fixed-width metadata + content hash out, nothing shuffles the
    pixels."""
    from data_engineering_spark.operators.multimodal import (
        decode_image_pixels,
    )

    d = load_table(spark, sf_dir, "documents")
    base = (
        d.select(
            "doc_id",
            F.regexp_replace("text", "[^ -~]", "").alias("__a"),
        )
        .withColumn(
            "__h",
            F.least(
                F.floor(F.length("__a") / 8).cast("int"), F.lit(32)
            ),
        )
        .filter(F.col("__h") >= 1)
    )
    payload = F.encode(
        F.concat(
            F.lit("P5\n8 "),
            F.col("__h").cast("string"),
            F.lit("\n255\n"),
            F.expr("substr(__a, 1, __h * 8)"),
        ),
        "utf-8",
    )
    decoded = decode_image_pixels(
        base.select("doc_id", payload.alias("payload")), id_col="doc_id"
    )
    # width 8 is a CONSTANT in the oracle; the decoded value must agree
    return decoded.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        "mode",
        F.sha2("pixels", 256).alias("pixel_sha"),
    )


@query(
    "q_multimodal_frame_sample",
    oracle="""
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS len
      FROM documents WHERE octet_length(encode(text)) > 0),
    c AS (
      SELECT doc_id, len,
             (len + 63) // 64 AS nchunks,
             len - 64 * ((len + 63) // 64 - 1) AS last_len
      FROM d)
    SELECT doc_id AS id,
           (nchunks + 1) // 2 AS n_frames,
           CAST(64 * ((nchunks + 1) // 2 - 1)
                + CASE WHEN (nchunks - 1) % 2 = 0
                       THEN last_len ELSE 64 END AS BIGINT)
             AS sampled_bytes
    FROM c
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out shape (1 payload → k binary frames,
    frame_size=64, stride=2 — every even chunk kept). The oracle
    reproduces the per-doc frame count and byte total in closed form:
    all kept frames are 64 bytes except the final chunk, kept iff the
    chunk count is odd."""
    frames = sample_frames(
        _binary_docs(spark, sf_dir), id_col="doc_id",
        frame_size=64, stride=2,
    )
    return frames.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame")).alias("sampled_bytes"),
    )


@query(
    "q_multimodal_wav",
    oracle="""
    WITH a AS (
      SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
      FROM documents),
    h AS (SELECT doc_id, t, length(t) AS n FROM a WHERE length(t) >= 1)
    SELECT doc_id,
           8000 AS sample_rate, 1 AS n_channels, 8 AS bits,
           CAST(n AS BIGINT) AS n_frames,
           CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(list_max(list_transform(range(1, n + 1),
                i -> abs(ord(substr(t, CAST(i AS INT), 1)) - 128)))
             AS INT) AS peak
    FROM h
    """,
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTABLE audio decode (no media library): each document's
    printable-ASCII bytes become the PCM8 sample stream of a synthetic
    8 kHz mono WAV, assembled byte-for-byte in JVM expressions (binary
    concat + unhex little-endian header fields — no Python in the
    build). decode_wav recovers rate/channels/frames/duration and the
    exact integer peak amplitude, all oracle-checked; RMS is emitted by
    the operator but excluded here (float mean is summation-order
    dependent, the one non-portable field)."""
    from data_engineering_spark.operators.multimodal import decode_wav

    d = load_table(spark, sf_dir, "documents")
    base = (
        d.select(
            "doc_id",
            F.regexp_replace("text", "[^ -~]", "").alias("__a"),
        )
        .withColumn("__n", F.length("__a"))
        .filter(F.col("__n") >= 1)
    )

    def le(v, width):
        """little-endian `width`-byte binary of int expression v."""
        bs = [
            F.lpad(
                F.hex(F.expr(f"shiftright({v}, {8 * i})") % 256), 2, "0"
            )
            for i in range(width)
        ]
        return F.unhex(F.concat(*bs))

    ascii_ = lambda s: F.encode(F.lit(s), "utf-8")
    payload = F.concat(
        ascii_("RIFF"), le("__n + 36", 4), ascii_("WAVE"),
        ascii_("fmt "), le("16", 4),
        F.unhex(F.lit("0100")),          # PCM
        F.unhex(F.lit("0100")),          # mono
        le("8000", 4),                   # sample rate
        le("8000", 4),                   # byte rate (8-bit mono)
        F.unhex(F.lit("0100")),          # block align
        F.unhex(F.lit("0800")),          # bits per sample
        ascii_("data"), le("__n", 4),
        F.encode(F.col("__a"), "utf-8"),
    )
    decoded = decode_wav(
        base.select("doc_id", payload.alias("payload")), id_col="doc_id"
    )
    return decoded.select(
        F.col("id").alias("doc_id"),
        "sample_rate", "n_channels", "bits", "n_frames", "duration_ms",
        "peak",
    )


def _dhash_oracle(max_hamming: int = 2) -> str:
    """The dHash pipeline is deterministic INTEGER work end-to-end
    (pixel bytes are ASCII codes, nearest-resample is floor-division
    index math, bits are byte comparisons), so DuckDB can replay it
    symbolically from the text: the 64 gradient bits become two 32-bit
    integers (hi/lo — avoids BIGINT sign-bit gymnastics) and the
    banded candidate join is replaced by the exact all-pairs popcount
    (the banding is pigeonhole-exact, so the result sets are equal by
    construction — THAT equality is what this oracle proves)."""
    xs = [(i * 24) // 9 for i in range(9)]  # nearest-resample columns

    def bit(k: int) -> str:
        y, j = divmod(k, 8)
        p1 = f"((({y}*h)//8)*24 + {xs[j] + 1})"
        p2 = f"((({y}*h)//8)*24 + {xs[j + 1] + 1})"
        return f"(ascii(substr(a,{p2},1)) > ascii(substr(a,{p1},1)))"

    hi = " + ".join(
        f"CASE WHEN {bit(k)} THEN {1 << (31 - k)} ELSE 0 END"
        for k in range(32)
    )
    lo = " + ".join(
        f"CASE WHEN {bit(k)} THEN {1 << (63 - k)} ELSE 0 END"
        for k in range(32, 64)
    )
    return f"""
    WITH base AS (
      SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS a
      FROM documents),
    sized AS (
      SELECT doc_id, a,
             LEAST(CAST(FLOOR(LENGTH(a) / 24) AS INT), 24) AS h
      FROM base),
    hashed AS (
      SELECT doc_id, {hi} AS hi, {lo} AS lo
      FROM sized WHERE h >= 9)
    SELECT x.doc_id AS id_a, y.doc_id AS id_b,
           CAST(bit_count(xor(x.hi, y.hi))
                + bit_count(xor(x.lo, y.lo)) AS INT) AS hamming
    FROM hashed x JOIN hashed y ON x.doc_id < y.doc_id
    WHERE bit_count(xor(x.hi, y.hi))
          + bit_count(xor(x.lo, y.lo)) <= {max_hamming}
    """


@query("q_multimodal_dhash_neardup", oracle=_dhash_oracle())
def q_mm_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup end-to-end: the same synthetic 24-wide
    PGM payloads as q_multimodal_decode are dHashed (decode →
    grayscale → gradient bits, operators/multimodal.dhash_images) and
    near-dup pairs found by pigeonhole banding over the 64-bit hash +
    exact popcount verify (dhash_neardup_pairs). Oracled exactly: the
    hash is integer work DuckDB replays symbolically from the text,
    and the oracle's all-pairs formulation proves the banding loses no
    pairs (see _dhash_oracle); pytest additionally covers identity,
    noise tolerance, and planted-pair recall."""
    from data_engineering_spark.operators.multimodal import (
        dhash_images,
        dhash_neardup_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    base = (
        d.select(
            "doc_id",
            F.regexp_replace("text", "[^ -~]", "").alias("__a"),
        )
        .withColumn(
            "__h",
            F.least(
                F.floor(F.length("__a") / 24).cast("int"), F.lit(24)
            ),
        )
        .filter(F.col("__h") >= 9)  # dHash needs >= 9 columns wide
    )
    payload = F.encode(
        F.concat(
            F.lit("P5\n24 "),
            F.col("__h").cast("string"),
            F.lit("\n255\n"),
            F.expr("substr(__a, 1, __h * 24)"),
        ),
        "utf-8",
    )
    hashes = dhash_images(
        base.select("doc_id", payload.alias("payload")), id_col="doc_id"
    )
    return dhash_neardup_pairs(hashes, max_hamming=2)


@query(
    "q_multimodal_audio_features",
    # rows-only: an FFT has no SQL twin — but the ROW SET does: one row
    # per doc whose printable-ASCII payload holds >= 1 full FFT frame
    # (256 samples), the exact filter the Spark side applies
    # exact twin columns: the doc set AND the frame count — frames =
    # 1 + (n_samples - 256) // 128 (n_fft=256, hop=128, one byte per
    # sample), replayed in SQL on the same printable-ASCII length
    rows_oracle="""
    WITH a AS (
      SELECT doc_id,
             length(regexp_replace(text, '[^ -~]', '', 'g')) AS n
      FROM documents)
    SELECT doc_id,
           CAST(1 + (n - 256) // 128 AS INTEGER) AS n_fft_frames,
           CAST(1.0 AS DOUBLE) AS centroid_hz,
           CAST([] AS DOUBLE[]) AS band_db
    FROM a WHERE n >= 256
    """,
    rows_key_cols=["doc_id", "n_fft_frames"],
)
def q_mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral front-end over the synthetic WAV payloads (same
    byte-exact JVM payload build as q_multimodal_wav): framed Hann
    rfft power folded to 8 band energies + spectral centroid per doc
    (operators/multimodal.audio_spectral_features). Rows-only driver
    check — an FFT has no SQL twin; tests/test_multimodal.py pins the
    numerics against known sinusoids."""
    from data_engineering_spark.operators.multimodal import (
        audio_spectral_features,
    )

    d = load_table(spark, sf_dir, "documents")
    base = (
        d.select(
            "doc_id",
            F.regexp_replace("text", "[^ -~]", "").alias("__a"),
        )
        .withColumn("__n", F.length("__a"))
        .filter(F.col("__n") >= 256)  # one full FFT frame minimum
    )

    def le(v, width):
        bs = [
            F.lpad(
                F.hex(F.expr(f"shiftright({v}, {8 * i})") % 256), 2, "0"
            )
            for i in range(width)
        ]
        return F.unhex(F.concat(*bs))

    ascii_ = lambda s: F.encode(F.lit(s), "utf-8")  # noqa: E731
    payload = F.concat(
        ascii_("RIFF"), le("__n + 36", 4), ascii_("WAVE"),
        ascii_("fmt "), le("16", 4),
        F.unhex(F.lit("0100")), F.unhex(F.lit("0100")),
        le("8000", 4), le("8000", 4),
        F.unhex(F.lit("0100")), F.unhex(F.lit("0800")),
        ascii_("data"), le("__n", 4),
        F.encode(F.col("__a"), "utf-8"),
    )
    feats = audio_spectral_features(
        base.select("doc_id", payload.alias("payload")), id_col="doc_id"
    )
    return feats.select(
        F.col("id").alias("doc_id"), "n_fft_frames", "centroid_hz",
        "band_db",
    )
