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


def test_decode_images_stub_raises(bin_df):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(Exception) as ei:
        decode_images(bin_df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


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
