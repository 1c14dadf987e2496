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
