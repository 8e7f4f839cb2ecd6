"""Multimodal (binary) column operators (SURVEY.md §2.11).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schemas, Arrow batch shapes, partitioning —
is real and tested; the actual media decode is stubbed behind
import-guards because media libraries are not in this container
(clearly marked below).

Design for 100 TB: binary payloads never pass through a shuffle — all
per-item work is mapInPandas over the scan partitions (Arrow batches),
and anything aggregated downstream (features, metadata) is fixed-width.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes → format label (hex, uppercase)
MAGIC_PREFIXES = {
    "FFD8FF": "jpeg",
    "89504E47": "png",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "494433": "mp3",
    "1A45DFA3": "webm/mkv",
    "66747970": "mp4",  # actually at offset 4; checked separately
}


def with_binary_metadata(
    df: DataFrame, bin_col: str = "payload"
) -> DataFrame:
    """Typed metadata for an opaque binary column — pure JVM expressions:
    byte length, sha256 content id, magic-byte format sniff."""
    b = F.col(bin_col)
    hex8 = F.upper(F.hex(F.substring(b, 1, 4)))
    fmt = F.lit("unknown")
    for prefix, label in MAGIC_PREFIXES.items():
        fmt = F.when(hex8.startswith(prefix), label).otherwise(fmt)
    # mp4: 'ftyp' at byte offset 5
    fmt = F.when(
        F.upper(F.hex(F.substring(b, 5, 4))) == "66747970", "mp4"
    ).otherwise(fmt)
    return (
        df.withColumn("byte_size", F.length(b).cast("long"))
        .withColumn("content_sha", F.sha2(b, 256))
        .withColumn("format", fmt)
    )


BYTE_HISTOGRAM_SCHEMA = "id long, features array<float>"
BYTE_HISTOGRAM_COUNTS_SCHEMA = "id long, features array<long>"


def byte_histogram_features(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    normalize: bool = True,
) -> DataFrame:
    """256-bin byte histogram per item — normalized float mass
    (default) or exact integer counts (``normalize=False``; counts are
    order-independent, so downstream aggregates of them are
    cross-engine deterministic — see queries/multimodal.py).

    A real (deterministic, media-free) feature extractor exercising the
    exact plumbing a CNN/CLIP encoder would use: mapInPandas over Arrow
    batches, numpy-vectorized, fixed-width output. Swap the body for a
    model forward pass and nothing else changes.
    """
    import numpy as np
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def histogram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                h = np.bincount(arr, minlength=256)
                if normalize:
                    h = h.astype("float32")
                    total = h.sum()
                    h = h / total if total else h
                else:
                    h = h.astype("int64")
                feats.append(h)
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    schema = (
        BYTE_HISTOGRAM_SCHEMA if normalize else BYTE_HISTOGRAM_COUNTS_SCHEMA
    )
    return src.mapInPandas(histogram, schema)


DECODED_IMAGE_SCHEMA = "id long, width int, height int, mode string"


def decode_images(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload"
) -> DataFrame:
    """Decode image dimensions via PIL when available.

    STUB FALLBACK: PIL is not installed in this container — without it
    this raises NotImplementedError at execution time. The mapInPandas
    signature, schema and batching are the real interface and are
    import-guard tested."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            from PIL import Image  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - env without PIL
            raise NotImplementedError(
                "image decode requires pillow (stubbed in this environment)"
            ) from e
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["payload"]):
                img = Image.open(io.BytesIO(bytes(buf)))
                rows.append((i, img.width, img.height, img.mode))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "mode"]
            )

    return src.mapInPandas(decode, DECODED_IMAGE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    frame_size: int = 1024,
    stride: int = 4,
) -> DataFrame:
    """'Video' frame sampling stand-in: split the payload into
    fixed-size chunks and emit every `stride`-th one. Deterministic and
    media-free, but the fan-out shape (one row → k frame rows, binary
    preserved) is exactly what a real ffmpeg-backed sampler produces."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for i, buf in zip(pdf["id"], pdf["payload"]):
                data = bytes(buf)
                chunks = [
                    data[o : o + frame_size]
                    for o in range(0, len(data), frame_size)
                ]
                out.extend(
                    (i, idx, chunk)
                    for idx, chunk in enumerate(chunks)
                    if idx % stride == 0
                )
            yield pd.DataFrame(
                out, columns=["id", "frame_idx", "frame"]
            )

    return src.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)
