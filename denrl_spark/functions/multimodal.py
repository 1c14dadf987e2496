"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video attachments ride transcript rows as ``binary`` columns
with a metadata struct (mime, width/height or duration, codec). The
Spark-side plumbing — schema, partition sizing, Arrow batch shape,
iterator-UDF signature — is real and tested; the actual media decode is
STUBBED (``decode_stub``) because no media libraries exist in this
container: it raises NotImplementedError unless ``fake=True``, in which
case it produces a deterministic feature vector derived from the bytes
(so downstream feature pipelines are exercised end-to-end).

At scale: media rows are orders of magnitude wider than text rows, so
``attachments`` is a SEPARATE table keyed by (conv_id, turn_idx,
att_idx), joined only where needed, and feature extraction runs through
``mapInPandas`` with small ``maxRecordsPerBatch`` to bound executor
memory per Arrow batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

ATTACHMENT_SCHEMA = (
    "conv_id string, turn_idx int, att_idx int, mime string, "
    "width int, height int, payload binary"
)

FEATURE_DIM = 16


def synth_attachments(spark: SparkSession, transcripts: DataFrame, every: int = 7) -> DataFrame:
    """Deterministic fake attachments for ~1/``every`` turns: payload is
    a content hash of the row key (stands in for real media bytes)."""
    rows = transcripts.where(F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(every)) == 0)
    return rows.select(
        "conv_id",
        "turn_idx",
        F.lit(0).alias("att_idx"),
        F.lit("image/png").alias("mime"),
        (F.pmod(F.xxhash64("conv_id"), F.lit(512)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("turn_idx"), F.lit(512)) + 16).cast("int").alias("height"),
        F.encode(F.concat_ws(":", "conv_id", "turn_idx"), "UTF-8").alias("payload"),
    )


def decode_stub(payload: bytes, mime: str, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/ffmpeg (absent here). fake=True yields
    a deterministic unit-norm feature vector from the payload hash."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    h = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    arr = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
    arr = arr / np.linalg.norm(arr)
    return arr.astype(np.float32)


def extract_features(attachments: DataFrame, fake: bool = True) -> DataFrame:
    """(conv_id, turn_idx, att_idx, feature array<float>): Arrow-batched
    iterator UDF over the payload column — the real plumbing around the
    stubbed decode."""

    def gen(batches):
        for pdf in batches:
            feats = [
                decode_stub(bytes(p), m, fake=fake).tolist()
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "att_idx": pdf["att_idx"],
                    "feature": feats,
                }
            )

    return attachments.mapInPandas(
        gen, "conv_id string, turn_idx int, att_idx int, feature array<float>"
    )


def resize_stub(
    payload: bytes, width: int, height: int, target: int, fake: bool = False
) -> tuple[bytes, int, int]:
    """STUB: real resize needs PIL (absent). fake=True returns a
    deterministic re-hash of (payload, target) with aspect-preserving
    target dims — the metadata math is real, the pixels are not."""
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL, not present in this environment; "
            "pass fake=True for the deterministic stand-in"
        )
    # exact integer math on the long side (float scale*w can land at
    # 31.999... and truncate below target)
    if width >= height:
        nw, nh = target, max(1, round(height * target / max(width, 1)))
    else:
        nh, nw = target, max(1, round(width * target / max(height, 1)))
    out = hashlib.blake2b(payload + f":{nw}x{nh}".encode(), digest_size=32).digest()
    return out, nw, nh


def resize_images(attachments: DataFrame, target: int = 64, fake: bool = True) -> DataFrame:
    """Image resize over the attachments table: Arrow-batched iterator
    UDF; output schema mirrors the input so resized tables pipeline into
    the same consumers. Real plumbing, stubbed pixels (module docstring)."""

    def gen(batches):
        for pdf in batches:
            outs = [
                resize_stub(bytes(p), int(w), int(h), target, fake=fake)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "att_idx": pdf["att_idx"],
                    "mime": pdf["mime"],
                    "width": [o[1] for o in outs],
                    "height": [o[2] for o in outs],
                    "payload": [o[0] for o in outs],
                }
            )

    return attachments.mapInPandas(gen, ATTACHMENT_SCHEMA)


def sample_frames(
    attachments: DataFrame, n_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Video frame sampling: one output row PER SAMPLED FRAME
    (conv_id, turn_idx, att_idx, frame_idx, frame_payload) — the explode
    shape a video pipeline needs (frames then flow into extract_features
    / resize_images like any image attachment). Deterministic stand-in
    frames (real demux needs ffmpeg); the row-explosion plumbing,
    schema, and batch sizing are real."""
    if not fake:
        raise NotImplementedError(
            "video demux requires ffmpeg, not present in this environment; "
            "pass fake=True for the deterministic stand-in"
        )

    def gen(batches):
        for pdf in batches:
            rows = []
            for c, t, a, p in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["att_idx"], pdf["payload"]
            ):
                for f in range(n_frames):
                    fp = hashlib.blake2b(
                        bytes(p) + f":frame{f}".encode(), digest_size=32
                    ).digest()
                    rows.append((c, int(t), int(a), f, fp))
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "att_idx", "frame_idx", "frame_payload"],
            )

    return attachments.mapInPandas(
        gen,
        "conv_id string, turn_idx int, att_idx int, frame_idx int, "
        "frame_payload binary",
    )
