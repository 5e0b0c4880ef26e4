"""Spark-side synthetic corpus materialization.

Builds the ``pages`` input table (exact ``input_hint`` shape) from the
driver-provided ``documents`` parquet via the deterministic pagemodel
formulas. This is test scaffolding, not an engine operator: the render runs
once per tier inside ``mapInPandas`` (Arrow-batched) and is cached as
parquet under ``.data/`` so repeated queries/benches just scan parquet.

At 100 TB the real input is a Common-Crawl-style Iceberg table; everything
downstream of ``load_pages`` only ever sees the 5-column schema, so the
swap is a reader change, not an engine change.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import pagemodel as pm

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".data")


def _render_factory(n_pages: int, n_hosts: int):
    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [
                pm.page_record(int(i), t, lg, n_pages, n_hosts)
                for i, t, lg in zip(pdf["id"], pdf["text"], pdf["lang"])
            ]
            yield pd.DataFrame.from_records(recs)

    return render


def build_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the pages DataFrame (unmaterialized) for a testdata dir."""
    n_pages, n_hosts = pm.sizing(sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    n_docs = docs.count()
    parallelism = spark.sparkContext.defaultParallelism
    base = (
        spark.range(0, n_pages, numPartitions=max(parallelism, 1))
        .withColumn("doc_id", F.col("id") % F.lit(n_docs))
        .join(F.broadcast(docs), "doc_id")  # docs ≤ 5000 rows: broadcast
        .select("id", "text", "lang")
    )
    return base.mapInPandas(_render_factory(n_pages, n_hosts), PAGES_SCHEMA)


def load_pages(spark: SparkSession, sf_dir: str, cache: bool = True) -> DataFrame:
    """Pages table for a tier, materialized once to parquet and re-read
    (so filters/pruning push into a real scan, as with Iceberg)."""
    tier = pm.tier_for_dir(sf_dir)
    path = os.path.join(_CACHE_ROOT, f"pages_{tier}.parquet")
    if not cache:
        return build_pages(spark, sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(_CACHE_ROOT, exist_ok=True)
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        # FIXED file count, independent of which session builds the cache:
        # the bench scaling runs read this same layout at several local[N]
        # levels, so the layout must not depend on the builder's parallelism
        # (a local[4]-built 16-file cache gave local[16] zero straggler
        # headroom in round 1). 64 files x ~13 MB also splits well under
        # maxPartitionBytes for every N used anywhere.
        n_files = 64
        # uncompressed: snappy decode serializes badly under 32-way UDF
        # contention (measured 3× slower full-corpus extraction); scratch
        # fixture data trades disk for scan parallelism
        build_pages(spark, sf_dir).repartition(n_files).write.mode(
            "overwrite"
        ).option("compression", "none").parquet(tmp)
        shutil.rmtree(path, ignore_errors=True)
        os.rename(tmp, path)
    return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
