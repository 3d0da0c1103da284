"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schema, partition-friendly batch shape, UDF
signatures, metadata propagation — is real and tested. The *codec* step
is stubbed: this container has no image/audio libraries, so decode either
(a) raises NotImplementedError when a real codec is requested, or
(b) runs the deterministic built-in "fake" codec, which interprets the
payload as a homogeneous byte tensor (documented header layout below).
Swapping in PIL/ffmpeg later only replaces ``_decode_payload``.

Fake payload layout (bytes): 4-byte magic ``GMM1`` + uint16 width +
uint16 height + uint8 channels + raw w*h*c bytes (image); for audio,
magic ``GMA1`` + uint32 sample_rate + int16 samples.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMG_MAGIC = b"GMM1"
AUD_MAGIC = b"GMA1"

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

IMG_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("mean_intensity", T.DoubleType(), False),
        T.StructField("std_intensity", T.DoubleType(), False),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
    ]
)


def encode_fake_image(width: int, height: int, channels: int, pixels: np.ndarray) -> bytes:
    assert pixels.dtype == np.uint8 and pixels.size == width * height * channels
    return IMG_MAGIC + struct.pack("<HHB", width, height, channels) + pixels.tobytes()


def encode_fake_audio(sample_rate: int, samples: np.ndarray) -> bytes:
    assert samples.dtype == np.int16
    return AUD_MAGIC + struct.pack("<I", sample_rate) + samples.tobytes()


def _decode_payload(payload: bytes, codec: str):
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} requires an image/audio library not present in "
            "this environment; use codec='fake' (documented header format) "
            "or install the codec and extend _decode_payload"
        )
    magic = payload[:4]
    if magic == IMG_MAGIC:
        w, h, c = struct.unpack("<HHB", payload[4:9])
        px = np.frombuffer(payload[9 : 9 + w * h * c], dtype=np.uint8)
        return ("image", w, h, c, px)
    if magic == AUD_MAGIC:
        (sr,) = struct.unpack("<I", payload[4:8])
        samples = np.frombuffer(payload[8:], dtype=np.int16)
        return ("audio", sr, samples)
    raise ValueError("unknown payload magic")


def image_features(assets: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode + per-image stats. Arrow batches in, one row per image out."""
    src = assets.select("asset_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                kind, w, h, c, px = _decode_payload(bytes(payload), codec)
                rows.append(
                    (
                        int(aid), int(w), int(h), int(c),
                        float(px.mean()) if px.size else 0.0,
                        float(px.std()) if px.size else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "channels",
                    "mean_intensity", "std_intensity",
                ],
            )

    return src.mapInPandas(run, IMG_FEATURES_SCHEMA)


def resize_image(assets: DataFrame, factor: int = 2, codec: str = "fake") -> DataFrame:
    """Downsample by integer factor (nearest-neighbor on the fake codec);
    returns the same asset schema with the resized payload."""
    src = assets.select("asset_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                _, w, h, c, px = _decode_payload(bytes(payload), codec)
                img = px.reshape(h, w, c)[::factor, ::factor, :]
                nh, nw = img.shape[0], img.shape[1]
                out.append(
                    (int(aid), kind, encode_fake_image(nw, nh, c, np.ascontiguousarray(img).ravel()))
                )
            yield pd.DataFrame(out, columns=["asset_id", "kind", "payload"])

    return src.mapInPandas(run, ASSET_SCHEMA)


def audio_features(assets: DataFrame, codec: str = "fake") -> DataFrame:
    src = assets.select("asset_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _, sr, samples = _decode_payload(bytes(payload), codec)
                rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if samples.size else 0.0
                rows.append((int(aid), int(sr), int(samples.size), rms))
            yield pd.DataFrame(
                rows, columns=["asset_id", "sample_rate", "n_samples", "rms"]
            )

    return src.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def frame_sample(assets: DataFrame, every_k: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Video stand-in: treat the payload as fixed-size frames, keep every
    k-th — the partition/batch plumbing of real frame sampling."""
    src = assets.select("asset_id", "payload")
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(payload)
                n = len(buf) // frame_bytes
                for f in range(0, n, every_k):
                    rows.append(
                        (int(aid), f, buf[f * frame_bytes : (f + 1) * frame_bytes])
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_no", "frame"])

    return src.mapInPandas(run, schema)
