

def test_audio_spectral_features_sine(spark):
    """A pure 1 kHz sine at 8 kHz: energy concentrates in the band
    containing 1 kHz and the centroid lands near 1 kHz."""
    import io
    import struct

    import numpy as np

    from data_engineering_spark.operators.multimodal import (
        audio_spectral_features,
    )

    rate, n = 8000, 2048
    t = np.arange(n) / rate
    pcm = (np.sin(2 * np.pi * 1000 * t) * 120 + 128).astype(np.uint8)
    body = pcm.tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    df = spark.createDataFrame([(1, bytearray(wav))], "id long, payload binary")
    rows = audio_spectral_features(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_fft_frames"] == 1 + (n - 256) // 128
    assert abs(r["centroid_hz"] - 1000) < 120  # window leakage tolerance
    # 1 kHz of a 4 kHz Nyquist range falls in band 2 of 8 (1000-1500Hz
    # edge: bins 0-4000 split into 8 -> band index 2)
    band = int(1000 / (4000 / 8))
    assert r["band_db"][band] == max(r["band_db"])


def test_audio_spectral_features_null_for_bad_payloads(spark):
    from data_engineering_spark.operators.multimodal import (
        audio_spectral_features,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"not a wav")), (2, bytearray(b"RIFFxxxxWAVE"))],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in audio_spectral_features(df).collect()}
    assert rows[1]["n_fft_frames"] is None
    assert rows[2]["band_db"] is None
