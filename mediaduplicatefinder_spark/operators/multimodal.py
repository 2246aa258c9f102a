"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

The reference decodes images with stb_image (S9, main_cli.cpp:155-159,
stb_image.h:427) and hashes the pixel buffer. This container has no
image/audio codecs, so — per the build brief — the *decode* step is
stubbed behind a deterministic fake format while every Spark-side piece
is real and tested: binary columns with typed metadata, Arrow batch
shape through ``mapInPandas``, partitioning, and the downstream
feature → ANN handoff (operators/embeddings.py).

Fake media container (datagen/media.py writes it, tests parse it):

    b"FAKEMEDIA" | kind:1B (0=image 1=audio 2=video)
                 | width:4B LE | height:4B LE | n_frames:4B LE
                 | payload bytes (pseudo-pixels, seed-derived)

A real deployment swaps ``_decode_real`` for PIL/ffmpeg inside the same
UDF signature — schema and batch shape do not change.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"FAKEMEDIA"
HEADER_LEN = len(MAGIC) + 1 + 4 + 4 + 4
KINDS = ("image", "audio", "video")

META_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "payload_bytes long, valid boolean"
)
FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, features array<float>"


def pack_media(kind: int, width: int, height: int, n_frames: int, payload: bytes) -> bytes:
    return MAGIC + struct.pack("<BIII", kind, width, height, n_frames) + payload


def _decode_real(payload: bytes):  # pragma: no cover - exercised only with codecs
    """Real codec hook. Container has no PIL/ffmpeg; the deterministic
    fake path below carries the pipeline. Cite: stb_image usage at
    main_cli.cpp:155-159 is the role being stubbed."""
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg, not present in this container"
    )


def decode_media_meta(media: DataFrame) -> DataFrame:
    """media(media_id, payload: binary) -> typed metadata. Malformed
    payloads yield valid=false rows instead of failing the task (the
    reference's per-file try/catch tolerance, main_cli.cpp:438-477)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"].to_numpy(),
                "kind": [],
                "width": [],
                "height": [],
                "n_frames": [],
                "payload_bytes": [],
                "valid": [],
            }
            for raw in pdf["payload"]:
                raw = bytes(raw) if raw is not None else b""
                if len(raw) >= HEADER_LEN and raw.startswith(MAGIC):
                    kind, w, h, nf = struct.unpack(
                        "<BIII", raw[len(MAGIC) : HEADER_LEN]
                    )
                    out["kind"].append(KINDS[kind] if kind < len(KINDS) else "unknown")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(nf)
                    out["payload_bytes"].append(len(raw) - HEADER_LEN)
                    out["valid"].append(True)
                else:
                    out["kind"].append("unknown")
                    out["width"].append(0)
                    out["height"].append(0)
                    out["n_frames"].append(0)
                    out["payload_bytes"].append(len(raw))
                    out["valid"].append(False)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(fn, schema=META_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic FEATURE_DIM-dim feature vector per media row — the
    stub for "decode + embed": a byte-histogram projection of the payload
    body, numpy-vectorized per Arrow batch. Output feeds
    operators.embeddings (ANN / near-dup) unchanged."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.zeros((len(pdf), FEATURE_DIM), dtype=np.float32)
            for i, raw in enumerate(pdf["payload"]):
                body = bytes(raw)[HEADER_LEN:] if raw is not None else b""
                if body:
                    arr = np.frombuffer(body, dtype=np.uint8)
                    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                    feats[i] = hist / max(1, len(arr))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "features": [f for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample(meta: DataFrame, every: int = 7) -> DataFrame:
    """Video rows -> one row per sampled frame index (0, every, 2*every,
    ...) — pure column ops (sequence + explode), no UDF. The Spark twin
    of frame-striding in a video loader."""
    v = meta.filter((F.col("kind") == "video") & (F.col("n_frames") > 0))
    return v.select(
        "media_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )


def resize_plan(meta: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning as column math (the compute-free half of a resize
    stage): target dims preserving aspect ratio, capped at max_side.
    The pixel work itself belongs to the codec stub."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return meta.filter(F.col("valid")).select(
        "media_id",
        "kind",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.floor(F.col("width") * scale).cast("int").alias("target_w"),
        F.floor(F.col("height") * scale).cast("int").alias("target_h"),
    )
