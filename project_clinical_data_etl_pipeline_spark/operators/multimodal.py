"""Multimodal (image/audio/video) column operators.

Design: media payloads are opaque ``binary`` columns travelling next to
typed metadata (width/height/codec/duration). Decode and
feature-extraction run as Arrow-batched Pandas functions over
``mapInPandas`` — per-partition, streaming batches, never materializing
a partition in memory at once.

Codec tiers:
- REAL decoders for container formats that need no external library:
  PPM/P6 images and RIFF/WAV PCM audio are parsed with stdlib ``struct``
  + numpy inside the Arrow kernels (header parse, sample/pixel decode,
  nearest-neighbor resize, feature extraction — RMS / zero-crossing /
  spectral centroid via ``np.fft`` for audio, channel stats + luma
  histogram for images).
- Compressed codecs (JPEG/PNG/MP4 — PIL/ffmpeg are NOT in this
  container) stay stubbed: ``decode_image_features`` raises
  NotImplementedError for them unless ``fake=True``, in which case a
  deterministic fake decoder (hash-derived dimensions/features)
  exercises the REAL Spark plumbing — schema, batch iteration,
  partitioning — end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema for decoded-image metadata + features.
IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, n_channels int, feature array<float>"
)


#: Output schema for decoded-audio metadata + features.
AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, sample_rate int, n_channels int, n_samples bigint, "
    "duration_s double, rms double, zcr double, spectral_centroid_hz double"
)


def decode_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    feat_dim: int = 16,
    fake: bool = False,
    max_side: int | None = None,
    on_error: str = "raise",
    skip_acc=None,
) -> DataFrame:
    """Decode + feature-extract image payloads via ``mapInPandas``.

    PPM/P6 payloads are REALLY decoded (header parse + raw RGB pixels
    via numpy; optional nearest-neighbor downsample to ``max_side``
    before feature extraction); features are per-channel mean/std plus
    a 10-bin luma histogram, unit-normalized and padded/truncated to
    ``feat_dim``. Compressed formats (JPEG/PNG — no PIL/opencv in this
    container) raise NotImplementedError unless ``fake=True``, which
    routes EVERY payload through the deterministic hash-derived stub
    (exercising the identical Spark plumbing). ``on_error='skip'``
    drops undecodable rows instead of failing the task — at warehouse
    scale corrupt media is routine and one bad byte must not kill a
    100-partition stage.

    Skips are never silent: pass ``skip_acc`` (a
    ``sparkContext.accumulator(0)``) to get an exact dropped-row count
    after the action completes; without one, each batch that dropped
    rows logs its count to the executor's stderr. A partition-wide
    decoder regression (every payload truncated) therefore shows up as
    a number, not as an empty-but-healthy output.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip'; got {on_error!r}")

    # NOTE: the kernel is fully self-contained (stdlib+numpy only, defined
    # inside the closure) so cloudpickle serializes it BY VALUE — workers
    # need no import of this package, keeping the query independent of the
    # driver process's cwd/sys.path.
    def fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
        # Deterministic stand-in for a real image decode: dimensions and a
        # unit-norm feature vector derived from the payload hash.
        h = hashlib.sha256(payload if payload is not None else b"").digest()
        feats = [((h[i % 32] / 255.0) * 2.0 - 1.0) for i in range(feat_dim)]
        s = sum(f * f for f in feats) ** 0.5 or 1.0
        return 64 + h[0], 64 + h[1], 3, [f / s for f in feats]

    def ppm_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
        import numpy as np

        # P6 header: magic, width, height, maxval as whitespace-separated
        # tokens ('#' comments allowed), then ONE whitespace byte, then
        # raw RGB triplets.
        pos = 2  # past b'P6'
        tokens: list[int] = []
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = tokens
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        need = w * h * 3
        body = payload[pos : pos + need]
        if len(body) != need:
            raise ValueError("truncated PPM body")
        img = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
        if max_side is not None and max(h, w) > max_side:
            # nearest-neighbor downsample: pure index striding, no codec
            sh = np.linspace(0, h - 1, min(h, max_side)).round().astype(int)
            sw = np.linspace(0, w - 1, min(w, max_side)).round().astype(int)
            img = img[sh][:, sw]
        x = img.astype(np.float64) / 255.0
        luma = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        hist, _ = np.histogram(luma, bins=10, range=(0.0, 1.0))
        feats = np.concatenate(
            [x.mean(axis=(0, 1)), x.std(axis=(0, 1)), hist / luma.size]
        )
        feats = feats[:feat_dim]
        if feats.size < feat_dim:
            feats = np.pad(feats, (0, feat_dim - feats.size))
        n = float(np.sqrt((feats * feats).sum())) or 1.0
        return w, h, 3, [float(v) / n for v in feats]

    def decode(payload) -> tuple[int, int, int, list[float]]:
        if fake:
            return fake_decode(payload)
        if payload is None:
            raise ValueError("NULL payload")
        head = bytes(payload[:8])
        if head[:2] == b"P6":
            return ppm_decode(bytes(payload))
        if head[:2] == b"\xff\xd8" or head[:4] == b"\x89PNG":
            # recognized-but-codec-less: NEVER swallowed by on_error —
            # a missing library is a deployment bug, not bad data
            raise NotImplementedError(
                "JPEG/PNG need PIL/opencv (absent in this container) — "
                "pass fake=True to exercise the pipeline with the "
                "deterministic stub decoder"
            )
        raise ValueError("unrecognized image payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        for pdf in batches:
            rows = []
            skipped = 0
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rows.append((int(mid), *decode(payload)))
                except NotImplementedError:
                    raise
                except Exception:
                    if on_error == "raise":
                        raise
                    skipped += 1
            if skipped:
                if skip_acc is not None:
                    skip_acc.add(skipped)
                else:
                    print(
                        f"decode_image_features: skipped {skipped}/{len(pdf)} "
                        "undecodable payloads in batch",
                        file=sys.stderr,
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels", "feature"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def decode_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    on_error: str = "raise",
    skip_acc=None,
) -> DataFrame:
    """REAL WAV (RIFF PCM, 8/16-bit) decode + feature extraction via
    ``mapInPandas`` — stdlib ``struct`` header walk + numpy sample
    decode, no external codec. Emits per-clip metadata and three
    classic features: RMS energy, zero-crossing rate, and the spectral
    centroid in Hz (``np.fft.rfft`` magnitude-weighted mean frequency,
    computed on the channel-mean mono signal). Compressed audio
    (MP3/AAC) has no in-container codec and raises NotImplementedError;
    ``on_error='skip'`` drops malformed rows (truncated chunks, exotic
    bit depths) instead of failing the stage — never silently: pass
    ``skip_acc`` (a ``sparkContext.accumulator(0)``) for an exact
    dropped-row count after the action, else each dropping batch logs
    its count to executor stderr."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip'; got {on_error!r}")

    def wav_decode(payload: bytes):
        import struct

        import numpy as np

        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            if payload[:3] in (b"ID3", b"\xff\xfb\x90"):
                raise NotImplementedError(
                    "compressed audio needs ffmpeg (absent in this container)"
                )
            raise ValueError("not a RIFF/WAVE payload")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            body = payload[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise ValueError("truncated chunk")
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
        if audio_fmt != 1:
            raise ValueError(f"non-PCM wav format {audio_fmt}")
        if bits == 16:
            x = np.frombuffer(data[: len(data) - (len(data) % (2 * n_ch))],
                              dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 8:
            x = (np.frombuffer(data[: len(data) - (len(data) % n_ch)],
                               dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported bit depth {bits}")
        x = x.reshape(-1, n_ch)
        n_samples = x.shape[0]
        mono = x.mean(axis=1)
        rms = float(np.sqrt((mono * mono).mean())) if n_samples else 0.0
        zcr = (
            float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean())
            if n_samples > 1
            else 0.0
        )
        if n_samples > 1:
            mag = np.abs(np.fft.rfft(mono))
            freqs = np.fft.rfftfreq(n_samples, d=1.0 / rate)
            tot = float(mag.sum())
            centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
        else:
            centroid = 0.0
        return (
            int(rate), int(n_ch), int(n_samples),
            n_samples / float(rate), rms, zcr, centroid,
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        for pdf in batches:
            rows = []
            skipped = 0
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rows.append((int(mid), *wav_decode(bytes(payload))))
                except NotImplementedError:
                    raise
                except Exception:
                    if on_error == "raise":
                        raise
                    skipped += 1
            if skipped:
                if skip_acc is not None:
                    skip_acc.add(skipped)
                else:
                    print(
                        f"decode_audio_features: skipped {skipped}/{len(pdf)} "
                        "undecodable payloads in batch",
                        file=sys.stderr,
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "rms", "zcr", "spectral_centroid_hz",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "media_id",
    duration_col: str = "duration_s",
    fps: float = 1.0,
) -> DataFrame:
    """Video frame-sampling plan: expand each video row into (media_id,
    frame_ts) rows at ``fps`` — pure ``sequence``+``explode``, no codec
    needed. The decode of each sampled frame is then a
    ``decode_image_features`` pass."""
    n_frames = F.greatest(
        (F.col(duration_col) * F.lit(fps)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i.cast("double") / F.lit(fps),
            )
        ).alias("frame_ts"),
    )
