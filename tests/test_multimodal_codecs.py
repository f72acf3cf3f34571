"""Real in-container codecs (operators.multimodal): PPM/P6 image and
RIFF/WAV PCM audio decode with stdlib+numpy only — values pinned
against directly-computed oracles on synthesized payloads; malformed
payloads honor on_error='skip'; compressed formats stay an HONEST
NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators.multimodal import (
    decode_audio_features,
    decode_image_features,
)


def make_ppm(w: int, h: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    header = f"P6\n# test comment\n{w} {h}\n255\n".encode()
    return header + img.tobytes(), img


def make_wav(
    rate: int = 8000, freq: float = 440.0, secs: float = 0.25,
    n_ch: int = 1, bits: int = 16,
) -> bytes:
    n = int(rate * secs)
    t = np.arange(n) / rate
    mono = 0.5 * np.sin(2 * np.pi * freq * t)
    x = np.tile(mono[:, None], (1, n_ch))
    if bits == 16:
        data = (x * 32767).astype("<i2").tobytes()
    else:
        data = ((x * 127) + 128).astype(np.uint8).tobytes()
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@pytest.fixture(scope="module")
def media_df(spark):
    ppm, _ = make_ppm(12, 8, seed=1)
    rows = [
        (0, bytearray(ppm)),
        (1, bytearray(make_wav())),  # wrong type for image op — skip leg
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_ppm_decode_real_values(spark):
    ppm, img = make_ppm(10, 6, seed=7)
    df = spark.createDataFrame([(5, bytearray(ppm))], "media_id long, payload binary")
    row = decode_image_features(df).collect()[0]
    assert (row["width"], row["height"], row["n_channels"]) == (10, 6, 3)
    x = img.astype(np.float64) / 255.0
    luma = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    hist, _ = np.histogram(luma, bins=10, range=(0.0, 1.0))
    feats = np.concatenate(
        [x.mean(axis=(0, 1)), x.std(axis=(0, 1)), hist / luma.size]
    )[:16]
    feats = np.pad(feats, (0, 16 - feats.size))
    feats = feats / (np.sqrt((feats * feats).sum()) or 1.0)
    got = np.array(row["feature"], dtype=np.float64)
    assert np.allclose(got, feats, atol=1e-6)


def test_ppm_resize_changes_features_not_dims(spark):
    ppm, _ = make_ppm(64, 32, seed=3)
    df = spark.createDataFrame([(1, bytearray(ppm))], "media_id long, payload binary")
    full = decode_image_features(df).collect()[0]
    small = decode_image_features(df, max_side=16).collect()[0]
    # reported dims are the SOURCE dims; the downsample only feeds
    # feature extraction
    assert (small["width"], small["height"]) == (full["width"], full["height"]) == (64, 32)
    assert small["feature"] != full["feature"]


def test_wav_decode_real_values(spark):
    rate, freq, secs = 8000, 440.0, 0.25
    df = spark.createDataFrame(
        [(9, bytearray(make_wav(rate, freq, secs)))], "media_id long, payload binary"
    )
    row = decode_audio_features(df).collect()[0]
    assert row["sample_rate"] == rate
    assert row["n_channels"] == 1
    assert row["n_samples"] == int(rate * secs)
    assert abs(row["duration_s"] - secs) < 1e-9
    # a 0.5-amplitude sine has RMS 0.5/sqrt(2)
    assert abs(row["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    # zero crossings of a 440 Hz sine ~ 2*freq per second
    assert abs(row["zcr"] * rate - 2 * freq) < 30
    # spectral centroid near the tone (broadened by the rect window)
    assert 300 < row["spectral_centroid_hz"] < 900


def test_wav_stereo_and_8bit(spark):
    df = spark.createDataFrame(
        [
            (0, bytearray(make_wav(n_ch=2))),
            (1, bytearray(make_wav(bits=8))),
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_audio_features(df).collect()}
    assert rows[0]["n_channels"] == 2
    assert rows[1]["sample_rate"] == 8000
    assert abs(rows[1]["rms"] - 0.5 / np.sqrt(2)) < 5e-3  # 8-bit quantization


def test_on_error_skip_drops_malformed(spark, media_df):
    # payload 1 is a WAV — not decodable as an image
    out = decode_image_features(media_df, on_error="skip").collect()
    assert [r["media_id"] for r in out] == [0]
    truncated = spark.createDataFrame(
        [(3, bytearray(make_wav()[:40]))], "media_id long, payload binary"
    )
    assert decode_audio_features(truncated, on_error="skip").count() == 0
    with pytest.raises(Exception):
        decode_audio_features(truncated, on_error="raise").collect()
    with pytest.raises(ValueError):
        decode_image_features(media_df, on_error="drop")


def test_compressed_formats_stay_honest(spark):
    jpeg = spark.createDataFrame(
        [(0, bytearray(b"\xff\xd8\xff\xe0" + b"\x00" * 32))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        decode_image_features(jpeg).collect()
    # on_error='skip' must NOT swallow the missing-codec signal
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        decode_image_features(jpeg, on_error="skip").collect()


def test_fake_path_unchanged_for_plumbing_query(spark, media_df):
    out = decode_image_features(media_df, fake=True).collect()
    assert len(out) == 2  # every payload decodes through the stub
    assert all(len(r["feature"]) == 16 for r in out)


def test_on_error_skip_surfaces_count_via_accumulator(spark):
    """on_error='skip' is never silent: a passed accumulator carries the
    exact dropped-row count after the action (both decoders). A
    partition-wide decoder regression shows up as a number, not as an
    empty-but-healthy output."""
    ppm, _ = make_ppm(6, 4, seed=3)
    rows = [
        (0, bytearray(ppm)),             # decodes
        (1, bytearray(b"garbage")),      # skip
        (2, bytearray(b"P6\n1 1\n255\n")),  # truncated body -> skip
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    acc = spark.sparkContext.accumulator(0)
    out = decode_image_features(df, on_error="skip", skip_acc=acc).collect()
    assert len(out) == 1 and acc.value == 2

    wav_rows = [
        (0, bytearray(make_wav())),
        (1, bytearray(b"RIFFxxxxWAVE")),  # no chunks -> skip
    ]
    wdf = spark.createDataFrame(wav_rows, "media_id long, payload binary")
    wacc = spark.sparkContext.accumulator(0)
    assert decode_audio_features(wdf, on_error="skip", skip_acc=wacc).count() == 1
    assert wacc.value == 1
