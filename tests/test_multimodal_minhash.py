"""Tests: multimodal binary plumbing and MinHash-LSH near-dup."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.minhash import (
    minhash_near_dup_pairs,
    minhash_signatures,
    shingle_rows,
)
from data_engineering_spark.operators.multimodal import (
    byte_histogram_features,
    decode_images,
    sample_frames,
    with_binary_metadata,
)
from data_engineering_spark.operators.text import ngram_jaccard_pairs

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bin_df(spark):
    rows = [
        (1, b"\xff\xd8\xff\xe0fakejpegdata"),
        (2, b"\x89PNG\r\n\x1a\nfakepngdata"),
        (3, b"plain text payload"),
        (4, b"\x00\x00\x00\x18ftypmp42rest-of-mp4"),
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_binary_metadata(bin_df):
    out = {r["id"]: r for r in with_binary_metadata(bin_df).collect()}
    assert out[1]["format"] == "jpeg"
    assert out[2]["format"] == "png"
    assert out[3]["format"] == "unknown"
    assert out[4]["format"] == "mp4"
    assert out[3]["byte_size"] == len(b"plain text payload")
    assert out[3]["content_sha"] == hashlib.sha256(
        b"plain text payload"
    ).hexdigest()


def test_byte_histogram(bin_df):
    feats = {r["id"]: r["features"]
             for r in byte_histogram_features(bin_df).collect()}
    h = feats[3]
    assert len(h) == 256
    assert abs(sum(h) - 1.0) < 1e-6
    # 'plain text payload' has 2 spaces out of 18 bytes
    assert h[ord(" ")] == pytest.approx(2 / 18, rel=1e-6)


def test_frame_sampling(bin_df):
    frames = sample_frames(bin_df, frame_size=4, stride=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["id"], []).append(r)
    # id=3: 18 bytes → 5 chunks of 4 (last short) → idx 0,2,4 kept
    idxs = sorted(r["frame_idx"] for r in by_id[3])
    assert idxs == [0, 2, 4]
    assert bytes(sorted(by_id[3], key=lambda r: r["frame_idx"])[0]["frame"]) == b"plai"


def test_decode_images_unsupported_format_quarantines(bin_df):
    """Formats with no native decoder (jpeg/png here) quarantine to
    NULL metadata when Pillow is absent — one undecodable payload in a
    100 TB corpus must not fail the whole job (decode_wav philosophy);
    the PPM/PGM/BMP decoders below are fully executable in this
    sandbox."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub path not reachable")
    except ImportError:
        pass
    rows = decode_images(bin_df).collect()
    assert rows and all(r["width"] is None for r in rows)


def _bmp24(width, height, rgb_rows, bottom_up=True):
    """Minimal uncompressed 24-bit BMP writer (test fixture)."""
    import struct

    row_bytes = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - width * 3)
    rows = rgb_rows[::-1] if bottom_up else rgb_rows
    body = b"".join(
        b"".join(bytes((b_, g, r)) for (r, g, b_) in row) + pad
        for row in rows
    )
    pix_off = 14 + 40
    hdr = b"BM" + struct.pack(
        "<IHHI", pix_off + len(body), 0, 0, pix_off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width,
        height if bottom_up else -height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return hdr + body


def _bmp8_gray(width, height, idx_rows):
    """Minimal 8-bit grayscale-palette BMP writer (test fixture)."""
    import struct

    row_bytes = (width + 3) & ~3
    pad = b"\x00" * (row_bytes - width)
    body = b"".join(bytes(row) + pad for row in idx_rows[::-1])
    pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
    pix_off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack(
        "<IHHI", pix_off + len(body), 0, 0, pix_off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(body),
        2835, 2835, 256, 0,
    )
    return hdr + pal + body


def test_decode_pnm_and_bmp_pixels(spark):
    """The numpy decoders recover exact dimensions, mode and pixel
    bytes for P5/P6/P2 netpbm and 24/8-bit BMP — no media library."""
    from data_engineering_spark.operators.multimodal import (
        decode_image_pixels,
    )

    gray = bytes(range(12))  # 4x3 grayscale
    rgb = bytes(range(36))  # 4x3 rgb
    rgb_rows = [
        [tuple(rgb[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3]) for x in range(4)]
        for y in range(3)
    ]
    rows = [
        (1, b"P5\n# comment\n4 3\n255\n" + gray),
        (2, b"P6 4 3 255\n" + rgb),
        (3, b"P2\n4 3\n255\n" + " ".join(str(b) for b in gray).encode()),
        (4, _bmp24(4, 3, rgb_rows, bottom_up=True)),
        (5, _bmp24(4, 3, rgb_rows, bottom_up=False)),
        (6, _bmp8_gray(4, 3, [list(gray[y * 4 : y * 4 + 4]) for y in range(3)])),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r["id"]: r for r in decode_image_pixels(df).collect()}
    for i in range(1, 7):
        assert (out[i]["width"], out[i]["height"]) == (4, 3), i
    for i, mode, want in [
        (1, "L", gray), (2, "RGB", rgb), (3, "L", gray),
        (4, "RGB", rgb), (5, "RGB", rgb), (6, "L", gray),
    ]:
        assert out[i]["mode"] == mode, i
        assert bytes(out[i]["pixels"]) == want, i
    # metadata-only twin agrees
    meta = {r["id"]: r for r in decode_images(df).collect()}
    assert meta[2]["mode"] == "RGB" and meta[6]["mode"] == "L"


def test_resize_images_nearest(spark):
    from data_engineering_spark.operators.multimodal import (
        resize_images_nearest,
    )

    # 2x2 grayscale PGM upscaled 2x: each source pixel becomes 2x2
    src = b"P5\n2 2\n255\n" + bytes([10, 20, 30, 40])
    df = spark.createDataFrame([(1, src)], "id long, payload binary")
    out = resize_images_nearest(df, 4, 4).collect()[0]
    assert (out["width"], out["height"], out["channels"]) == (4, 4, 1)
    import numpy as np

    img = np.frombuffer(bytes(out["pixels"]), dtype=np.uint8).reshape(4, 4)
    assert (img[:2, :2] == 10).all() and (img[:2, 2:] == 20).all()
    assert (img[2:, :2] == 30).all() and (img[2:, 2:] == 40).all()


def test_near_dup_release_cache_equivalent(spark):
    """release_cache=True (long-lived-session mode: eager materialize +
    unpersist) returns the same pairs as the default lazy plan."""
    d = load_table(spark, SF, "documents")
    as_set = lambda df: {  # noqa: E731
        (r["doc_a"], r["doc_b"], r["common"]) for r in df.collect()
    }
    assert as_set(
        minhash_near_dup_pairs(d, threshold=0.6, release_cache=True)
    ) == as_set(minhash_near_dup_pairs(d, threshold=0.6))
    assert as_set(
        ngram_jaccard_pairs(d, threshold=0.6, release_cache=True)
    ) == as_set(ngram_jaccard_pairs(d, threshold=0.6))


# --- MinHash ---------------------------------------------------------------

def test_minhash_signature_shape(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "x y z w v u t")],
        ["doc_id", "text"],
    )
    sh = shingle_rows(docs, "doc_id", "text")
    sigs = minhash_signatures(sh, num_hashes=16)
    rows = {r["doc"]: r for r in sigs.collect()}
    assert len(rows[1]) == 17  # doc + 16 hashes
    # identical docs → identical signatures; disjoint docs → different
    assert tuple(rows[1])[1:] == tuple(rows[2])[1:]
    assert tuple(rows[1])[1:] != tuple(rows[3])[1:]


def test_minhash_matches_exact_join(spark):
    """On the driver's corpus the LSH path must reproduce the exact
    prefix-filter join (banding miss prob ~1e-6 at t=0.6)."""
    d = load_table(spark, SF, "documents")
    exact = {
        (r["doc_a"], r["doc_b"], r["common"])
        for r in ngram_jaccard_pairs(d, threshold=0.6).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"], r["common"])
        for r in minhash_near_dup_pairs(d, threshold=0.6).collect()
    }
    assert lsh == exact


def test_decode_wav_pcm16_and_pcm8(spark):
    """WAV decode: stdlib-written PCM16 stereo + PCM8 mono payloads
    decode to the known rate/channels/frames/duration; a full-scale
    square wave has rms ~= 1000 milli-units; garbage bytes yield NULL
    metadata instead of failing the batch."""
    import io
    import struct
    import wave

    from data_engineering_spark.operators.multimodal import decode_wav

    def wav_bytes(rate, n_ch, bits, frames):
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(n_ch)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        w.writeframes(frames)
        w.close()
        return buf.getvalue()

    # full-scale square wave, 100 frames of PCM16 stereo at 8 kHz
    sq = b"".join(
        struct.pack(
            "<hh", 32000 if i % 2 else -32000, 16000 if i % 2 else -16000
        )
        for i in range(100)
    )
    # PCM8 mono at 16 kHz: constant midpoint (silence) => rms 0
    silence = bytes([128] * 160)
    rows = [
        (1, wav_bytes(8000, 2, 16, sq)),
        (2, wav_bytes(16000, 1, 8, silence)),
        (3, b"not a wav at all"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r["id"]: r for r in decode_wav(df).collect()}

    r1 = out[1]
    assert (r1["sample_rate"], r1["n_channels"], r1["bits"]) == (8000, 2, 16)
    assert r1["n_frames"] == 100
    assert r1["duration_ms"] == 100 * 1000 // 8000
    assert abs(r1["rms_milli"] - round(32000 / 32768 * 1000)) <= 1
    assert r1["peak"] == 32000

    r2 = out[2]
    assert (r2["sample_rate"], r2["n_channels"], r2["bits"]) == (16000, 1, 8)
    assert r2["n_frames"] == 160
    assert r2["rms_milli"] == 0 and r2["peak"] == 0

    assert out[3]["sample_rate"] is None and out[3]["n_frames"] is None


def test_minhash_incremental_equals_full_run(spark):
    """The incremental path (new batch vs stored band index) must find
    exactly the full operator's pairs that touch the new batch — same
    hash family, same banding, so candidates and verdicts agree
    bit-for-bit."""
    from data_engineering_spark.operators.minhash import (
        minhash_band_index,
        minhash_incremental_pairs,
        minhash_near_dup_pairs,
    )

    d = load_table(spark, SF, "documents")
    corpus = d.filter(F.col("doc_id") < 350)
    new = d.filter(F.col("doc_id") >= 350)

    full = {
        (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard_r"])
        for r in minhash_near_dup_pairs(d).collect()
    }
    expected = {
        k: v for k, v in full.items() if k[0] >= 350 or k[1] >= 350
    }
    index = minhash_band_index(corpus)
    got = {
        (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard_r"])
        for r in minhash_incremental_pairs(new, corpus, index).collect()
    }
    assert got == expected
    assert all(a >= 350 or b >= 350 for a, b in got)


def _pgm(pixels, w, h):
    return b"P5\n%d %d\n255\n" % (w, h) + bytes(pixels)


def test_dhash_identical_and_noised(spark):
    """Identical payloads hash equal; a few flipped pixels stay within
    a small hamming distance; an unrelated image lands far away."""
    import random

    from data_engineering_spark.operators.multimodal import (
        dhash_images,
        dhash_neardup_pairs,
    )

    rng = random.Random(5)
    w, h = 32, 24
    base = [rng.randrange(256) for _ in range(w * h)]
    noised = list(base)
    for _ in range(10):  # light corruption
        noised[rng.randrange(w * h)] = rng.randrange(256)
    other = [rng.randrange(256) for _ in range(w * h)]
    df = spark.createDataFrame(
        [
            (1, bytearray(_pgm(base, w, h))),
            (2, bytearray(_pgm(base, w, h))),
            (3, bytearray(_pgm(noised, w, h))),
            (4, bytearray(_pgm(other, w, h))),
            (5, bytearray(b"not an image")),
        ],
        "id long, payload binary",
    )
    hs = {r["id"]: r["dhash"] for r in dhash_images(df).collect()}
    assert hs[1] == hs[2]
    assert hs[5] is None

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(hs[1], hs[3]) <= 6
    assert ham(hs[1], hs[4]) > 10

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_neardup_pairs(
            dhash_images(df), max_hamming=6
        ).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_dhash_banding_no_false_negatives(spark):
    """Planted pairs at exactly the hamming budget are still found
    (pigeonhole over max_hamming+1 bands)."""
    from pyspark.sql import functions as F

    from data_engineering_spark.operators.multimodal import (
        dhash_neardup_pairs,
    )

    base = 0x5A5A_1234_ABCD_EF01
    flipped = base
    for bit in (1, 17, 33, 49):  # spread across bands
        flipped ^= 1 << bit
    df = spark.createDataFrame(
        [(1, base - (1 << 63)), (2, flipped - (1 << 63)), (3, ~base & ((1 << 63) - 1))],
        "id long, dhash long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_neardup_pairs(df, max_hamming=4).collect()
    }
    assert got == {(1, 2): 4}


def test_mmr_diversifies_top_k(spark):
    """MMR must prefer a diverse set: with a cluster of near-identical
    highly-relevant vectors and one slightly-less-relevant orthogonal
    vector, plain top-2 takes two clones; MMR's second pick is the
    orthogonal one."""
    import numpy as np

    from data_engineering_spark.operators.similarity import mmr_topk

    base = np.zeros(8); base[0] = 1.0
    clone = np.zeros(8); clone[0] = 1.0; clone[1] = 0.01
    ortho = np.zeros(8); ortho[0] = 0.6; ortho[1] = 0.8
    far = np.zeros(8); far[2] = 1.0
    rows = [
        (1, [float(x) for x in base]),
        (2, [float(x) for x in clone]),
        (3, [float(x) for x in ortho]),
        (4, [float(x) for x in far]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0] + [0.0] * 7

    # diversity-heavy lambda: after the best hit, the most NOVEL items
    # win — the near-clone (redundancy ~1.0) is pushed out of the top-3
    # entirely even though it is the 2nd most relevant vector
    got = mmr_topk(df, q, k=3, lam=0.3)
    ids = [g[0] for g in got]
    assert ids == [1, 4, 3]
    rels = {g[0]: g[1] for g in got}
    assert rels[1] > rels[3] > rels[4]  # relevance reported faithfully

    # relevance-heavy lambda recovers plain top-k ordering
    plain = mmr_topk(df, q, k=2, lam=1.0)
    assert [g[0] for g in plain] == [1, 2]
