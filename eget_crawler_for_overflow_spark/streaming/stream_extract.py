"""Structured Streaming extraction path.

The reference is fully batch-per-request (SURVEY.md §2.9) and the north
rule is a batch frontier, so streaming is *not* on the parity surface.
This module documents and implements the natural streaming mapping for a
live-fetch deployment: a file/Kafka stream of pages → the same extraction
UDF bundle → windowed per-host metrics with a watermark. The extraction
code is byte-for-byte the batch UDF — one engine, two execution modes.

A per-host stateful politeness scheduler would use
``applyInPandasWithState`` here; with pre-fetched Common-Crawl input it has
nothing to wait for, so it is intentionally absent (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import PAGES_SCHEMA
from ..functions.extract import extract_page_udf


def stream_pages(spark: SparkSession, pages_dir: str, max_files: int = 4) -> DataFrame:
    """readStream over a parquet directory of pages (stand-in for a Kafka
    topic of fetched WARC records)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(pages_dir)
    )


def extract_stream(pages_stream: DataFrame) -> DataFrame:
    e = pages_stream.select(
        "url", "warc_ts", extract_page_udf(F.col("html")).alias("e")
    )
    return e.select(
        "url",
        "warc_ts",
        F.col("e.markdown").alias("markdown"),
        F.col("e.title").alias("title"),
        F.col("e.language").alias("language"),
    )


def windowed_host_counts(extracted: DataFrame) -> DataFrame:
    """Event-time windowed per-host page counts with late-data watermark —
    the streaming analog of the per-generation metrics rows."""
    return (
        extracted.withColumn(
            "host", F.parse_url(F.col("url"), F.lit("HOST"))
        )
        .withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", "5 minutes"), "host")
        .agg(F.count("*").alias("n_pages"))
    )
