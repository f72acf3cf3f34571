"""Multimodal (image/audio/video) column operators.

Design: media payloads are opaque ``binary`` columns travelling next to
typed metadata (width/height/codec/duration). Decode and
feature-extraction run as Arrow-batched Pandas functions over
``mapInPandas`` — per-partition, streaming batches, never materializing
a partition in memory at once.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are stubbed: ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (hash-derived dimensions/features) exercises the REAL
Spark plumbing — schema, batch iteration, partitioning — end to end.
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


def decode_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    feat_dim: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract image payloads via ``mapInPandas``.

    Real decoders plug in by replacing ``_fake_decode``; the Spark-side
    contract (Arrow batches in, typed rows out, partition-parallel) is
    identical. With ``fake=False`` this raises at execution time to make
    the stub explicit.
    """

    # NOTE: the kernel is fully self-contained (stdlib only, defined inside
    # the closure) so cloudpickle serializes it BY VALUE — workers need no
    # import of this package, keeping the query independent of the driver
    # process's cwd/sys.path.
    def fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
        # Deterministic stand-in for a real image decode: dimensions and a
        # unit-norm feature vector derived from the payload hash.
        h = hashlib.sha256(payload if payload is not None else b"").digest()
        feats = [((h[i % 32] / 255.0) * 2.0 - 1.0) for i in range(feat_dim)]
        s = sum(f * f for f in feats) ** 0.5 or 1.0
        return 64 + h[0], 64 + h[1], 3, [f / s for f in feats]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv — not in this container; "
                    "pass fake=True to exercise the pipeline with the "
                    "deterministic stub decoder"
                )
            rows = [
                (int(mid), *fake_decode(payload))
                for mid, payload in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels", "feature"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


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
