"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl (frontier engine + byte-identical
extraction) on the sf0.001-derived corpus. ``queries()``/``oracle_sql()``
expose every implemented operator from SURVEY.md §2 plus the
training-data-pipeline operators, checked against closed-form DuckDB
oracles at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eget_crawler_for_overflow_spark import pagemodel as pm  # noqa: E402
from eget_crawler_for_overflow_spark import queries as q  # noqa: E402
from eget_crawler_for_overflow_spark.fixtures import load_pages  # noqa: E402
from eget_crawler_for_overflow_spark.operators.frontier import (  # noqa: E402
    CrawlConfig,
    run_crawl,
)
from eget_crawler_for_overflow_spark.oracles import ORACLES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl the sf0.001 synthetic web snapshot from 3 seeds,
    returning the extracted table (url, depth, order, markdown, metadata)."""
    sf_dir = "/root/testdata/sf0.001"
    _, n_hosts = pm.sizing(sf_dir)
    pages = load_pages(spark, sf_dir)
    seeds = [pm.url_of(i, n_hosts) for i in (0, 2, 4)]
    cfg = CrawlConfig(max_depth=4, max_pages=100, use_bloom=True)
    res = run_crawl(spark, pages, seeds, cfg)
    return res.extracted.select(
        "url",
        "depth",
        "enqueue_seq",
        "generation",
        "status",
        "markdown",
        "title",
        "language",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
