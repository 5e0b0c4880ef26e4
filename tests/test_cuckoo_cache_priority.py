"""Cuckoo filter semantics, incremental-extract cache, priority frontier."""

import numpy as np
from pyspark.sql import functions as F

from eget_crawler_for_overflow_spark import pagemodel as pm
from eget_crawler_for_overflow_spark.fixtures import load_pages
from eget_crawler_for_overflow_spark.operators.cache import extract_incremental
from eget_crawler_for_overflow_spark.operators.cuckoo import CuckooShard
from eget_crawler_for_overflow_spark.operators.frontier import (
    CrawlConfig,
    run_crawl,
)

SF = "/root/testdata/sf0.001"
N_PAGES, N_HOSTS = 500, 8


def test_cuckoo_no_false_negatives_and_delete():
    c = CuckooShard(expected_n=5000)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, 5000, dtype=np.int64).view(np.uint64)
    assert c.add(keys) == 5000
    assert c.maybe_contains(keys).all()
    probe = rng.integers(0, 2**63, 20000, dtype=np.int64).view(np.uint64)
    fpp = c.maybe_contains(probe).mean()
    assert fpp < 0.01  # 16-bit fingerprints → ~2^-13 per-bucket
    # deletion: the capability Bloom lacks
    assert c.delete(keys[:1000]) == 1000
    assert not c.maybe_contains(keys[:1000]).all()
    assert c.maybe_contains(keys[1000:]).all()


def test_incremental_extract_skips_cached(spark, tmp_path):
    pages = load_pages(spark, SF)
    snap = str(tmp_path / "extracted_snapshot")
    first = extract_incremental(spark, pages.limit(60), snap, run_id=0)
    assert first.count() == 60
    # second run over a superset: only the 40 new urls are extracted
    second = extract_incremental(spark, pages.limit(100), snap, run_id=1)
    assert second.count() == 40
    total = spark.read.parquet(snap)
    assert total.count() == 100
    assert total.select("url").distinct().count() == 100
    # TTL: everything older than 1 run is re-extracted
    third = extract_incremental(
        spark, pages.limit(100), snap, ttl_generations=0, run_id=2
    )
    assert third.count() == 100


def test_cache_key_includes_options(spark, tmp_path):
    """Two different option sets must not share cache rows — the key is
    url + options fingerprint (cache_service.py:37-55), not url alone."""
    pages = load_pages(spark, SF)
    snap = str(tmp_path / "snap_opts")
    a = extract_incremental(spark, pages.limit(30), snap, run_id=0)
    assert a.count() == 30
    # same urls, different content-affecting options: full re-extract
    b = extract_incremental(
        spark, pages.limit(30), snap, run_id=1, options={"only_main": False}
    )
    assert b.count() == 30
    # same urls, same options as run 0: all cached
    c = extract_incremental(spark, pages.limit(30), snap, run_id=2)
    assert c.count() == 0
    # irrelevant option keys don't change the fingerprint
    d = extract_incremental(
        spark, pages.limit(30), snap, run_id=3, options={"formats": ["md"]}
    )
    assert d.count() == 0


def test_priority_frontier_prefers_cold_hosts(spark):
    pages = load_pages(spark, SF)
    seeds = [pm.url_of(i, N_HOSTS) for i in (0, 2, 4)]
    # small budget forces the priority order to pick WHICH urls survive
    fifo = run_crawl(
        spark,
        pages,
        seeds,
        CrawlConfig(max_depth=3, max_pages=12, same_domain=False),
    )
    prio = run_crawl(
        spark,
        pages,
        seeds,
        CrawlConfig(
            max_depth=3,
            max_pages=12,
            same_domain=False,
            priority_host_weight=1.0,
        ),
    )
    fifo_urls = [r["url"] for r in fifo.admitted.orderBy("enqueue_seq").collect()]
    prio_urls = [r["url"] for r in prio.admitted.orderBy("enqueue_seq").collect()]
    assert len(prio_urls) == 12
    # determinism: rerun gives the identical admission sequence
    prio2 = run_crawl(
        spark,
        pages,
        seeds,
        CrawlConfig(
            max_depth=3,
            max_pages=12,
            same_domain=False,
            priority_host_weight=1.0,
        ),
    )
    assert prio_urls == [
        r["url"] for r in prio2.admitted.orderBy("enqueue_seq").collect()
    ]
    # and zero weights stay exact-FIFO (covered elsewhere vs simulator):
    assert fifo_urls != [] and fifo_urls[0] == seeds[0]


def test_priority_zero_weights_equals_fifo(spark):
    pages = load_pages(spark, SF)
    seeds = [pm.url_of(i, N_HOSTS) for i in (0, 2)]
    a = run_crawl(spark, pages, seeds, CrawlConfig(max_depth=3, max_pages=20))
    b = run_crawl(
        spark,
        pages,
        seeds,
        CrawlConfig(
            max_depth=3,
            max_pages=20,
            priority_depth_weight=1.0,  # constant within a wave → same order
        ),
    )
    assert sorted(
        (r["url"], r["enqueue_seq"]) for r in a.admitted.collect()
    ) == sorted((r["url"], r["enqueue_seq"]) for r in b.admitted.collect())
