"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video libraries are not in this container, so the *decode*
step is stubbed (deterministic fake or NotImplementedError), but the
Spark-side plumbing — binary schema, partitioning, mapInPandas batch
shape, typed output struct — is real and tested. Swapping the stub for
PIL/torchaudio/ffmpeg changes one function body, no plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("declared_bytes", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def blobs_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic blob table derived from documents: payload = utf-8
    text bytes, media_type cycles by doc_id."""
    return docs.select(
        F.col("doc_id").alias("blob_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.length(F.col("text")).cast("int").alias("declared_bytes"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB decode: real image/audio decoding is unavailable in this
    container. The deterministic fake derives 'dimensions' from payload
    bytes so tests pin the plumbing end-to-end; a real deployment replaces
    this body with PIL.Image.open / av.open etc."""
    n = len(payload)
    if media_type == "image":
        return {"width": n % 640 + 1, "height": n % 480 + 1, "n_frames": 1}
    if media_type == "audio":
        return {"width": 0, "height": 0, "n_frames": n % 16000 + 1}
    if media_type == "video":
        return {"width": n % 1920 + 1, "height": n % 1080 + 1, "n_frames": n % 300 + 1}
    raise NotImplementedError(f"unknown media type {media_type!r}")


def extract_features(blobs: DataFrame) -> DataFrame:
    """mapInPandas feature extraction — Arrow batches of binary payloads,
    one output row per blob. This is the exact plan shape a real decoder
    would use (vectorized batch in, typed struct out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                }
            )

    return blobs.mapInPandas(run, FEATURE_SCHEMA)
