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

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.extract import extract_page_udf


def options_fingerprint(options: dict | None) -> str:
    """Canonical scrape-options fingerprint, mirroring the reference's
    content-affecting key parts (cache_service.py:37-55: sorted-key JSON
    of onlyMainContent/waitFor/mobile/includeScreenshot/includeRawHtml
    joined to the url before hashing)."""
    options = options or {}
    relevant = {
        "onlyMainContent": options.get("only_main", True),
        "waitFor": options.get("wait_for_selector"),
        "mobile": options.get("mobile", False),
        "includeScreenshot": options.get("include_screenshot", False),
        "includeRawHtml": options.get("include_raw_html", False),
    }
    return json.dumps(relevant, sort_keys=True)


def extract_incremental(
    spark: SparkSession,
    pages: DataFrame,
    snapshot_dir: str,
    ttl_generations: int | None = None,
    run_id: int = 0,
    options: dict | None = None,
) -> DataFrame:
    """Extract pages not yet in the snapshot (or whose entry is older than
    ``ttl_generations`` runs); append to the snapshot; return only the
    newly extracted rows. The cache key is ``xxhash64(url, options
    fingerprint)`` — two different option sets never share a cache row
    (reference key: sha256(url + sorted relevant options),
    cache_service.py:37-55)."""
    fp = options_fingerprint(options)
    work = pages.select(
        "url", F.xxhash64("url", F.lit(fp)).alias("cache_key"), "html"
    )
    if os.path.exists(os.path.join(snapshot_dir, "_SUCCESS")):
        snap = spark.read.parquet(snapshot_dir).select("cache_key", "run_id")
        if ttl_generations is not None:
            snap = snap.filter(
                F.col("run_id") >= F.lit(run_id - ttl_generations)
            )
        work = work.join(snap, on="cache_key", how="left_anti")
    fresh = work.select(
        "url",
        "cache_key",
        F.lit(run_id).alias("run_id"),
        extract_page_udf(F.col("html")).alias("e"),
    ).select(
        "url",
        "cache_key",
        "run_id",
        F.col("e.markdown").alias("markdown"),
        F.col("e.title").alias("title"),
        F.col("e.language").alias("language"),
    )
    fresh.write.mode("append").parquet(snapshot_dir)
    return spark.read.parquet(snapshot_dir).filter(F.col("run_id") == run_id)
