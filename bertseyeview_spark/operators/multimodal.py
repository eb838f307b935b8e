"""Multimodal column plumbing: opaque binary payloads + typed metadata.

At 100 TB a training-data pipeline carries images/audio/video as
``binary`` columns with typed metadata structs alongside. The decode /
feature-extraction libraries aren't in this container, so the decode
kernels are STUBBED (clearly marked), while everything Spark-side is
real and tested: schemas, Arrow batch shape, ``mapInPandas`` signatures,
partition behavior.

Pattern: each operator is ``mapInPandas`` over (id, payload binary)
yielding fixed-schema feature rows; heavy per-item work stays inside
the Arrow batch loop, and batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "id long, byte_len int, first_byte int"
IMAGE_FEATURE_SCHEMA = (
    "id long, width int, height int, channels int, feature array<float>"
)
FRAME_SAMPLE_SCHEMA = "id long, frame_index int, frame_bytes binary"


def binary_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Cheap typed metadata over a binary column — byte length + first
    byte (magic-number sniffing stand-in). Pure-deterministic, no decode
    needed; this path is real, not stubbed."""
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "byte_len": pdf["p"].map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int32"),
                    "first_byte": pdf["p"].map(
                        lambda b: b[0] if b else -1
                    ).astype("int32"),
                }
            )

    return src.mapInPandas(run, schema=META_SCHEMA)


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB: real implementation uses PIL/opencv (not in container).
    Raises so callers wire the fake featurizer explicitly in tests."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this "
        "container; use fake_decode_image for plumbing tests"
    )


def fake_decode_image(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from payload bytes.
    Keeps the full Spark plumbing exercisable without codec libs."""
    n = len(payload or b"")
    return (n % 640 + 1, (n // 640) % 480 + 1, 3)


def image_features(
    df: DataFrame, id_col: str, payload_col: str, use_fake_decode: bool = True
) -> DataFrame:
    """Decode + fixed-size feature vector per image. With
    ``use_fake_decode`` the decode is the deterministic fake; otherwise
    the stub raises (documented container limitation)."""
    decode = fake_decode_image if use_fake_decode else decode_image
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, feats = [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["p"]):
                w, h, c = decode(payload)
                ids.append(i)
                ws.append(w)
                hs.append(h)
                cs.append(c)
                # fake "embedding": 4 deterministic moments of the bytes
                b = payload or b""
                s = sum(b[:256])
                feats.append(
                    [float(len(b)), float(w * h), float(s % 997), float(c)]
                )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(cs, dtype="int32"),
                    "feature": feats,
                }
            )

    return src.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str, every_n_bytes: int = 1024
) -> DataFrame:
    """Frame sampling stand-in: one UDTF-style expansion row per sampled
    'frame' (byte slice). Real video decode is a container limitation;
    the 1->N Arrow expansion shape is the part that matters at scale."""
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, payload in zip(pdf["id"], pdf["p"]):
                b = payload or b""
                for k in range(0, max(len(b), 1), every_n_bytes):
                    ids.append(i)
                    idxs.append(k // every_n_bytes)
                    frames.append(b[k : k + every_n_bytes])
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": frames,
                }
            )

    return src.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
