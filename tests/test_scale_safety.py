"""Scale-safety contracts of the crawl loop (VERDICT r1 §next-1/7):

* no driver-side collect is ever wave-sized — every ``collect()`` during a
  crawl returns a bounded number of rows (partition offsets, shard
  bitmaps, scalar metrics), regardless of how many URLs a generation
  admits;
* the seen set is maintained as an append-only bucketed table — the
  accumulated set is never rewritten;
* ``max_generations`` exhaustion with pending work emits a ``truncated``
  metric row + warning instead of silently dropping the tail.
"""

import warnings

import pytest
from pyspark.sql import functions as F
from pyspark.sql.classic.dataframe import DataFrame  # concrete impl (Spark 4)

from eget_crawler_for_overflow_spark import pagemodel as pm
from eget_crawler_for_overflow_spark.fixtures import load_pages
from eget_crawler_for_overflow_spark.operators.frontier import (
    CrawlConfig,
    run_crawl,
)

SF = "/root/testdata/sf0.001"
N_HOSTS = 8

# offsets ≤ #partitions, bitmap rows ≤ n_shards (+hash-collision slack),
# metric aggs ≤ a handful: nothing a crawl collects should exceed this,
# no matter the wave size
COLLECT_BOUND = 64


@pytest.fixture(scope="module")
def pages(spark):
    return load_pages(spark, SF)


@pytest.mark.parametrize("bloom_storage", ["broadcast", "files"])
def test_no_wave_sized_collect(spark, pages, monkeypatch, bloom_storage):
    sizes = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    seeds = [pm.url_of(i, N_HOSTS) for i in range(8)]
    cfg = CrawlConfig(
        max_depth=4, max_pages=None, same_domain=False,
        bloom_storage=bloom_storage,  # files mode: NO bitmap collect at all
    )
    res = run_crawl(spark, pages, seeds, cfg)
    # r7: metrics aggregation is lazy — in files mode the loop itself now
    # runs ZERO driver collects. Materialize the metrics surface inside
    # the spy window so the bounded-collect contract still covers it.
    res.metrics.collect()
    monkeypatch.undo()

    n_admitted = res.admitted.count()
    assert n_admitted > 2 * COLLECT_BOUND  # waves genuinely exceed the bound
    assert sizes, "crawl ran no collects at all?"
    assert max(sizes) <= COLLECT_BOUND, (
        f"driver-side collect of {max(sizes)} rows — wave-sized collects "
        f"are forbidden (all sizes: {sorted(set(sizes), reverse=True)[:5]})"
    )


def test_seen_table_is_append_only(spark, pages):
    """Each generation appends O(delta) files to the bucketed seen table;
    nothing rewrites earlier generations' files."""
    from eget_crawler_for_overflow_spark.operators import seen as seen_mod

    events = []
    orig_add = seen_mod.SeenSet.add

    def spy_add(self, admitted):
        orig_add(self, admitted)
        events.append(self.table)

    seen_mod.SeenSet.add = spy_add
    try:
        seeds = [pm.url_of(i, N_HOSTS) for i in (0, 2, 4)]
        res = run_crawl(spark, pages, seeds, CrawlConfig(max_depth=3, max_pages=None))
    finally:
        seen_mod.SeenSet.add = orig_add
    assert len(set(events)) == 1  # one table per crawl, appended per gen
    assert len(events) >= 3  # one add per admitting generation
    assert res.admitted.count() > 0


def test_truncation_metric_and_warning(spark, pages):
    seeds = [pm.url_of(i, N_HOSTS) for i in (0, 2, 4)]
    cfg = CrawlConfig(max_depth=5, max_pages=None, max_generations=2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = run_crawl(spark, pages, seeds, cfg)
    trunc = res.metrics.filter(F.col("name") == "truncated").collect()
    assert len(trunc) == 1
    assert trunc[0]["value"] > 0
    assert any("max_generations" in str(w.message) for w in caught)


def test_no_truncation_metric_on_clean_exit(spark, pages):
    seeds = [pm.url_of(i, N_HOSTS) for i in (0, 2, 4)]
    cfg = CrawlConfig(max_depth=2, max_pages=None)
    res = run_crawl(spark, pages, seeds, cfg)
    assert res.metrics.filter(F.col("name") == "truncated").count() == 0
