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
DECODED_PIXEL_SCHEMA = (
    "id long, width int, height int, channels int, mode string,"
    " pixels binary"
)


def _make_decoder():
    """Build the dependency-free image decoder as a CLOSURE.

    Deliberately a factory: Spark python workers unpickle UDFs in a
    process that may not have this package on sys.path (the driver
    harness owns the session). A module-level function would be
    cloudpickled BY REFERENCE (import on the worker → crash); a
    factory-made closure is pickled BY VALUE, so the decode logic
    travels inside the serialized task like the inline lambdas do.
    """

    def _decode_pnm(data: bytes):
        # Netpbm (P2/P3 ascii, P5/P6 binary; PGM/PPM) in pure numpy:
        # returns (width, height, channels, mode, pixel_bytes),
        # row-major 8-bit; None if not a PNM payload.
        import numpy as np

        if len(data) < 2 or data[0:1] != b"P" or data[1:2] not in b"2356":
            return None
        kind = data[1:2]
        # header tokenizer: whitespace-separated ints, '#' comments
        pos, toks = 2, []
        while len(toks) < 3 and pos < len(data):
            c = data[pos : pos + 1]
            if c == b"#":
                nl = data.find(b"\n", pos)
                pos = len(data) if nl < 0 else nl + 1
            elif c.isspace():
                pos += 1
            else:
                end = pos
                while end < len(data) and not data[end : end + 1].isspace():
                    end += 1
                toks.append(int(data[pos:end]))
                pos = end
        if len(toks) < 3:
            return None
        width, height, maxval = toks
        if width <= 0 or height <= 0 or not (0 < maxval < 256):
            return None
        channels = 3 if kind in (b"3", b"6") else 1
        n = width * height * channels
        if kind in (b"5", b"6"):
            pos += 1  # exactly one whitespace byte after maxval
            raw = data[pos : pos + n]
            if len(raw) < n:
                return None
            px = np.frombuffer(raw, dtype=np.uint8)
        else:  # ascii samples
            # '#' comments are spec-legal in the raster section too:
            # strip them line-wise before tokenizing, and treat any
            # non-integer or out-of-range sample as a malformed payload
            # (None → the caller's quarantine) rather than a raised
            # ValueError that would fail the whole Spark task
            body = b"\n".join(
                line.split(b"#", 1)[0]
                for line in data[pos:].split(b"\n")
            )
            vals = body.split()
            if len(vals) < n:
                return None
            try:
                ints = [int(v) for v in vals[:n]]
            except ValueError:
                return None
            if any(not 0 <= x <= maxval for x in ints):
                return None
            px = np.array(ints, dtype=np.uint8)
        mode = "RGB" if channels == 3 else "L"
        return width, height, channels, mode, px.tobytes()

    def _decode_bmp(data: bytes):
        # Uncompressed BMP (BITMAPINFOHEADER; 8-bit palette / 24-bit
        # BGR) in pure numpy; same return shape as _decode_pnm.
        import struct

        import numpy as np

        if len(data) < 54 or data[:2] != b"BM":
            return None
        pix_off = struct.unpack_from("<I", data, 10)[0]
        hdr_size = struct.unpack_from("<I", data, 14)[0]
        if hdr_size < 40:  # BITMAPCOREHEADER etc. unsupported
            return None
        width, height_raw = struct.unpack_from("<ii", data, 18)
        bpp = struct.unpack_from("<H", data, 28)[0]
        compression = struct.unpack_from("<I", data, 30)[0]
        if compression != 0 or bpp not in (8, 24) or width <= 0:
            return None
        height, bottom_up = abs(height_raw), height_raw > 0
        row_bytes = (width * bpp // 8 + 3) & ~3  # 4-byte aligned rows
        need = row_bytes * height
        if len(data) < pix_off + need:
            return None
        rows = np.frombuffer(
            data, dtype=np.uint8, count=need, offset=pix_off
        ).reshape(height, row_bytes)
        if bottom_up:
            rows = rows[::-1]
        if bpp == 24:
            img = rows[:, : width * 3].reshape(height, width, 3)
            img = img[:, :, ::-1]  # BGR → RGB
            return (
                width, height, 3, "RGB",
                np.ascontiguousarray(img).tobytes(),
            )
        # 8-bit: BGRA palette directly after the info header
        pal_off = 14 + hdr_size
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(n_colors, 4)
        idx = rows[:, :width]
        if bool(
            (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()
        ):
            # grayscale palette → 'L'
            px = pal[idx.reshape(-1), 0]
            return width, height, 1, "L", px.tobytes()
        px = pal[idx.reshape(-1)][:, [2, 1, 0]]  # BGR(A) → RGB
        return width, height, 3, "RGB", np.ascontiguousarray(px).tobytes()

    def decode_image_bytes(data: bytes):
        out = _decode_pnm(data)
        if out is None:
            out = _decode_bmp(data)
        if out is not None:
            return out
        try:  # pragma: no cover - env without PIL
            import io

            from PIL import Image  # type: ignore[import-not-found]
        except ImportError:
            raise NotImplementedError(
                "unsupported image format (PPM/PGM/BMP decode natively;"
                " others require pillow, absent in this environment)"
            ) from None
        img = Image.open(io.BytesIO(data))  # pragma: no cover
        px = img.tobytes()
        return img.width, img.height, len(img.getbands()), img.mode, px

    return decode_image_bytes


#: Dependency-free image decode: PPM/PGM (P2/P3/P5/P6) and uncompressed
#: BMP in numpy; PIL fallback for other formats when installed.
#: (width, height, channels, mode, pixel_bytes); NotImplementedError
#: for formats this sandbox genuinely can't decode.
decode_image_bytes = _make_decoder()


def decode_images(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload"
) -> DataFrame:
    """Decode image dimensions/mode per payload — executable in this
    sandbox for PPM/PGM/BMP via the numpy decoders (PIL, when present,
    widens the format set). mapInPandas over Arrow batches; binary
    payloads stay in the scan partitions, only fixed-width metadata
    comes out."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))
    dec = _make_decoder()  # closure: travels inside the task, no import

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["payload"]):
                # quarantine, not task death: one undecodable payload
                # in a 100 TB corpus must emit NULL metadata, same
                # philosophy as decode_wav / the CDC envelope parse
                try:
                    w, h, _c, mode, _px = dec(bytes(buf))
                except (NotImplementedError, ValueError):
                    w = h = mode = None
                rows.append((i, w, h, mode))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "mode"]
            )

    return src.mapInPandas(decode, DECODED_IMAGE_SCHEMA)


def decode_image_pixels(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload"
) -> DataFrame:
    """Full decode: per payload emit (width, height, channels, mode,
    pixels) with pixels as row-major 8-bit bytes — the input a resize /
    feature-extract stage consumes. Same mapInPandas shape as
    `decode_images`; pixel payloads never shuffle (downstream stages
    aggregate or re-encode within the same scan)."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))
    dec = _make_decoder()  # closure: travels inside the task, no import

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["payload"]):
                try:
                    w, h, c, mode, px = dec(bytes(buf))
                except (NotImplementedError, ValueError):
                    w = h = c = mode = px = None
                rows.append((i, w, h, c, mode, px))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "channels", "mode", "pixels",
                ],
            )

    return src.mapInPandas(decode, DECODED_PIXEL_SCHEMA)


def resize_images_nearest(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "id",
    bin_col: str = "payload",
) -> DataFrame:
    """Decode + nearest-neighbor resize to (out_w, out_h) — the
    preprocessing step before a vision encoder, dependency-free
    (numpy index arithmetic). Emits the resized pixel bytes with the
    same schema as `decode_image_pixels`."""
    import numpy as np
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))
    dec = _make_decoder()  # closure: travels inside the task, no import

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["payload"]):
                try:
                    w, h, c, mode, px = dec(bytes(buf))
                    img = np.frombuffer(px, dtype=np.uint8).reshape(
                        h, w, c
                    )
                except (NotImplementedError, ValueError):
                    rows.append((i, None, None, None, None, None))
                    continue
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                out = img[yi][:, xi]
                rows.append(
                    (i, out_w, out_h, c, mode,
                     np.ascontiguousarray(out).tobytes())
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "channels", "mode", "pixels",
                ],
            )

    return src.mapInPandas(resize, DECODED_PIXEL_SCHEMA)


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


DECODED_AUDIO_SCHEMA = (
    "id long, sample_rate int, n_channels int, bits int, n_frames long, "
    "duration_ms long, rms_milli long, peak int"
)


def decode_wav(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload"
) -> DataFrame:
    """Decode RIFF/WAVE PCM payloads (8/16-bit, any channel count) —
    the audio leg of the multimodal pipeline, implemented directly on
    the container format with numpy (no audio library needed: WAV PCM
    is a fixed 44-ish-byte header + interleaved little-endian samples).

    Emits per item: sample_rate, n_channels, bits, n_frames,
    duration_ms, rms_milli (root-mean-square amplitude of the first
    channel scaled to milli-units of full scale, integer-rounded so
    aggregates of it stay cross-engine deterministic), peak (max abs
    sample, first channel). Malformed/non-WAV payloads emit NULL
    metadata instead of failing the batch (same quarantine philosophy
    as the CDC envelope parse).

    Plan shape: mapInPandas over the scan's Arrow batches — payload
    bytes never shuffle; only fixed-width metadata leaves the stage.
    A real model front-end (spectrogram, codec) swaps into this exact
    slot without changing the plan around it.
    """
    import numpy as np
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def parse_one(buf: bytes):
        if len(buf) < 44 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
            return None
        # walk chunks: fmt then data (other chunks may intervene)
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body = buf[pos + 8 : pos + 8 + sz]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_fmt = int.from_bytes(fmt[0:2], "little")
        n_ch = int.from_bytes(fmt[2:4], "little")
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_fmt != 1 or bits not in (8, 16) or n_ch < 1:
            return None  # PCM only; compressed codecs are out of scope
        bytes_per = bits // 8
        n_frames = len(data) // (bytes_per * n_ch)
        if bits == 16:
            arr = np.frombuffer(
                data[: n_frames * n_ch * 2], dtype="<i2"
            ).reshape(-1, n_ch)
            centered = arr[:, 0].astype(np.int64)
            ch0 = centered.astype(np.float64) / 32768.0
        else:  # 8-bit WAV is unsigned, midpoint 128
            arr = np.frombuffer(
                data[: n_frames * n_ch], dtype=np.uint8
            ).reshape(-1, n_ch)
            centered = arr[:, 0].astype(np.int64) - 128
            ch0 = centered.astype(np.float64) / 128.0
        rms = float(np.sqrt(np.mean(ch0 * ch0))) if n_frames else 0.0
        peak = int(np.max(np.abs(centered))) if n_frames else 0
        return (
            rate,
            n_ch,
            bits,
            n_frames,
            (n_frames * 1000) // max(rate, 1),
            int(rms * 1000 + 0.5),
            peak,
        )

    def decode(batches):
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["payload"]):
                meta = parse_one(bytes(buf))
                if meta is None:
                    rows.append((i, None, None, None, None, None, None, None))
                else:
                    rows.append((i, *meta))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "sample_rate", "n_channels", "bits", "n_frames",
                    "duration_ms", "rms_milli", "peak",
                ],
            )

    return src.mapInPandas(decode, DECODED_AUDIO_SCHEMA)


def _make_wav_parser():
    """Factory for the RIFF/WAVE PCM first-channel parser — a CLOSURE
    for the same reason as _make_decoder: a module-level function would
    cloudpickle BY REFERENCE and require this package on the worker's
    sys.path, which the module's own contract says not to assume."""

    def _wav_pcm_first_channel(buf: bytes):
        # (sample_rate, first-channel float64 samples in [-1, 1)) from
        # a RIFF/WAVE PCM payload, or None for malformed/non-PCM input.
        # Same chunk-walk as decode_wav.
        import numpy as np

        if len(buf) < 44 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body = buf[pos + 8 : pos + 8 + sz]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + sz + (sz & 1)
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_fmt = int.from_bytes(fmt[0:2], "little")
        n_ch = int.from_bytes(fmt[2:4], "little")
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_fmt != 1 or bits not in (8, 16) or n_ch < 1:
            return None
        bytes_per = bits // 8
        n_frames = len(data) // (bytes_per * n_ch)
        if bits == 16:
            arr = np.frombuffer(data[: n_frames * n_ch * 2], dtype="<i2")
            ch0 = arr.reshape(-1, n_ch)[:, 0].astype(np.float64) / 32768.0
        else:
            arr = np.frombuffer(data[: n_frames * n_ch], dtype=np.uint8)
            ch0 = (
                arr.reshape(-1, n_ch)[:, 0].astype(np.float64) - 128.0
            ) / 128.0
        return rate, ch0

    return _wav_pcm_first_channel


def audio_spectral_features(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    n_fft: int = 256,
    hop: int = 128,
    n_bands: int = 8,
) -> DataFrame:
    """Spectral front-end features per WAV payload — the audio
    equivalent of the image histogram/dHash extractors, and the slot a
    real model front-end (mel filterbank, codec embedding) plugs into:

    - frame the first channel (`n_fft` window, `hop` stride), Hann
      window, rfft power spectrum averaged over frames;
    - `band_db`: mean power folded into `n_bands` equal bins of the
      rfft range, in dB (10·log10, floored at -120);
    - `centroid_hz`: spectral centroid of the mean spectrum.

    All numpy inside mapInPandas over Arrow batches: payload bytes
    never shuffle, one fixed-width feature row leaves the scan per
    item. Undecodable or too-short (< n_fft samples) payloads emit
    NULL features. Deterministic for fixed inputs, so rows-only driver
    checks are stable; the numerics are pytest-pinned against known
    sinusoids (an FFT has no SQL twin)."""
    import numpy as np
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))
    out_schema = (
        "id long, n_fft_frames int, centroid_hz double, "
        "band_db array<double>"
    )

    parse_wav = _make_wav_parser()  # closure: travels by value

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(n_fft)
        edges = np.linspace(0, n_fft // 2 + 1, n_bands + 1).astype(int)

        def one(buf: bytes):
            parsed = parse_wav(bytes(buf))
            if parsed is None:
                return None
            rate, x = parsed
            if len(x) < n_fft:
                return None
            n_frames = 1 + (len(x) - n_fft) // hop
            idx = (
                np.arange(n_fft)[None, :]
                + hop * np.arange(n_frames)[:, None]
            )
            spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
            mean_spec = spec.mean(axis=0)
            freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
            total = mean_spec.sum()
            centroid = (
                float((freqs * mean_spec).sum() / total) if total > 0 else 0.0
            )
            bands = [
                float(
                    10.0
                    * np.log10(max(mean_spec[a:b].mean(), 1e-12))
                )
                for a, b in zip(edges[:-1], edges[1:])
            ]
            return n_frames, round(centroid, 3), [round(b, 3) for b in bands]

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["payload"]):
                r = one(buf)
                rows.append((i, None, None, None) if r is None else (i, *r))
            yield pd.DataFrame(
                rows,
                columns=["id", "n_fft_frames", "centroid_hz", "band_db"],
            )

    return src.mapInPandas(feats, out_schema)


def dhash_images(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    hash_size: int = 8,
) -> DataFrame:
    """Perceptual difference-hash per image payload: decode →
    grayscale → nearest-resize to (hash_size+1) × hash_size → one bit
    per horizontal gradient sign → a 64-bit integer (for the default
    hash_size=8). Visually identical or lightly-edited images land
    within a few bits of each other, which is what
    `dhash_neardup_pairs` exploits. Arrow-batched mapInPandas (decode
    and the bit math are numpy work); the shuffleable output is one
    long per image. Undecodable payloads yield NULL — filter or
    quarantine downstream."""
    import pandas as pd

    src = df.select(
        F.col(id_col).alias("id"), F.col(bin_col).alias("payload")
    )
    dec = _make_decoder()
    hs = int(hash_size)

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def one(buf: bytes):
            try:
                w, h, c, mode, px = dec(bytes(buf))
            except (NotImplementedError, ValueError):
                return None  # undecodable payload → NULL hash
            if w is None or not w or not h:
                return None
            a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
            gray = a.mean(axis=2)
            # nearest-neighbor resample to (hs+1) wide, hs tall —
            # same index math as resize_images_nearest
            ys = (np.arange(hs) * h) // hs
            xs = (np.arange(hs + 1) * w) // (hs + 1)
            g = gray[np.ix_(ys, xs)]
            bits = (g[:, 1:] > g[:, :-1]).ravel()
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            # two's-complement into signed 64-bit for LongType
            if v >= 1 << 63:
                v -= 1 << 64
            return v

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "dhash": [one(b) for b in pdf["payload"]],
                }
            )

    return src.mapInPandas(hash_batch, "id long, dhash long")


def dhash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 4,
    id_col: str = "id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Image near-duplicate pairs: all (id_a < id_b) whose dHashes
    differ in at most `max_hamming` of 64 bits.

    Banded, not all-pairs: the hash splits into (max_hamming + 1)
    bit-chunks; by pigeonhole, any pair within the hamming budget
    agrees EXACTLY on at least one chunk, so candidates come from a
    self-equi-join on (band_id, chunk) — the same LSH-style shape as
    MinHash banding, no false negatives. The exact popcount of the
    XOR then verifies each candidate JVM-side (bit_count). Shuffle
    keys are (band, chunk) ints; no image data is ever joined."""
    n_bands = max_hamming + 1
    widths = [
        64 // n_bands + (1 if i < 64 % n_bands else 0)
        for i in range(n_bands)
    ]
    h = hashes.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h")
    ).where(F.col(hash_col).isNotNull())
    chunks = []
    shift = 0
    for band_id, wdt in enumerate(widths):
        mask = (1 << wdt) - 1
        chunks.append(
            F.struct(
                F.lit(band_id).alias("band"),
                F.shiftrightunsigned(F.col("h"), shift)
                .bitwiseAND(F.lit(mask))
                .alias("chunk"),
            )
        )
        shift += wdt
    banded = h.select(
        "id", "h", F.explode(F.array(*chunks)).alias("b")
    ).select("id", "h", F.col("b.band").alias("band"), F.col("b.chunk").alias("chunk"))
    a = banded.select(
        F.col("band"), F.col("chunk"),
        F.col("id").alias("id_a"), F.col("h").alias("h_a"),
    )
    b = banded.select(
        F.col("band"), F.col("chunk"),
        F.col("id").alias("id_b"), F.col("h").alias("h_b"),
    )
    cand = (
        a.join(b, ["band", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(
            F.col("h_a").bitwiseXOR(F.col("h_b"))
        ).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
