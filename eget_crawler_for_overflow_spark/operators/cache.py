"""Incremental extraction — the batch analog of the reference's Redis
result cache (cache_service.py:37-99; SURVEY.md §2.1 S3 / §2.4 J2).

The reference keys a 24h-TTL cache on sha256(url+options) and skips the
scrape on a hit. Set-oriented equivalent: an ``extracted`` snapshot table
content-addressed by ``url_hash``; an incremental run LEFT ANTI JOINs the
work set against the snapshot (hit ⇒ skip), extracts only the misses, and
appends. TTL becomes a predicate on ``extracted_at`` (re-extract rows
older than the window) — a filter pushed into the snapshot scan, not a
key-expiry daemon.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.extract import extract_page_udf


def extract_incremental(
    spark: SparkSession,
    pages: DataFrame,
    snapshot_dir: str,
    ttl_generations: int | None = None,
    run_id: int = 0,
) -> DataFrame:
    """Extract pages not yet in the snapshot (or whose entry is older than
    ``ttl_generations`` runs); append to the snapshot; return only the
    newly extracted rows."""
    work = pages.select(
        "url", F.xxhash64("url").alias("url_hash"), "html"
    )
    if os.path.exists(os.path.join(snapshot_dir, "_SUCCESS")):
        snap = spark.read.parquet(snapshot_dir).select("url_hash", "run_id")
        if ttl_generations is not None:
            snap = snap.filter(
                F.col("run_id") >= F.lit(run_id - ttl_generations)
            )
        work = work.join(snap, on="url_hash", how="left_anti")
    fresh = work.select(
        "url",
        "url_hash",
        F.lit(run_id).alias("run_id"),
        extract_page_udf(F.col("html")).alias("e"),
    ).select(
        "url",
        "url_hash",
        "run_id",
        F.col("e.markdown").alias("markdown"),
        F.col("e.title").alias("title"),
        F.col("e.language").alias("language"),
    )
    fresh.write.mode("append").parquet(snapshot_dir)
    return spark.read.parquet(snapshot_dir).filter(F.col("run_id") == run_id)
