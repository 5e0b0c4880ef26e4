"""Structured Streaming chunk feed — the cookbook RAG pipeline's shape.

The reference cookbook's production consumer
(cookbook/flink_app_2/kafka_utils.py) drives URLs through the /chunk
endpoint and streams flattened ``WebsiteChunk`` records to a Kafka topic
for MongoDB/RAG ingestion (payload knobs :177-185: sentence chunker,
max 512 / min 128 / overlap 50). This module is that pipeline as one
Spark streaming query: a stream of fetched pages → the SAME per-row
chunk-envelope UDF the batch /chunk surface uses → WebsiteChunk records.
Swap the memory/file sink for ``writeStream.format("kafka")`` and the
records land on the topic the cookbook's Flink/Mongo consumers read.

Stateless map over the stream (no watermark needed); the chunking code is
byte-for-byte the batch operator — one engine, two execution modes, same
guarantee stream_extract.py documents for extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.chunk_batch import (
    CHUNK_RESPONSE_SCHEMA,
    chunk_response_udf,
    website_chunks,
)

# the cookbook producer's payload (kafka_utils.py:177-185)
COOKBOOK_KNOBS = {
    "chunker_type": "sentence",
    "max_chunk_size": 512,
    "min_chunk_size": 128,
    "chunk_overlap": 50,
}


def chunk_stream(
    pages_stream: DataFrame,
    chunker_type: str = COOKBOOK_KNOBS["chunker_type"],
    max_chunk_size: int = COOKBOOK_KNOBS["max_chunk_size"],
    min_chunk_size: int = COOKBOOK_KNOBS["min_chunk_size"],
    chunk_overlap: int = COOKBOOK_KNOBS["chunk_overlap"],
) -> DataFrame:
    """(url, html) stream → WebsiteChunk record stream."""
    resp = pages_stream.select(
        "url",
        chunk_response_udf(
            F.col("html"),
            F.lit(chunker_type),
            F.lit(max_chunk_size).cast("int"),
            F.lit(min_chunk_size).cast("int"),
            F.lit(chunk_overlap).cast("int"),
        ).alias("r"),
    ).select(
        "url",
        *[
            F.col(f"r.{f.name}").alias(f.name)
            for f in CHUNK_RESPONSE_SCHEMA.fields
        ],
    )
    return website_chunks(resp)
