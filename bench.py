"""Benchmark: headline throughput at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "pages_extracted_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "scaling": {...}}

Headline = pages fetched+extracted per second (BASELINE.json metric): the
full extraction bundle (parse + markdown + metadata + structured data +
links) over every page of the corpus.

Scaling protocol (north rule, sandbox variant): no multi-node cluster is
available, so the same extraction job runs at local[N_LOW] and local[N_HIGH]
(default 8 vs 32) on the same input; efficiency = (T_low/T_high)/(high/low).
Set SPARK_GRAFT_SCALING=0 to skip the second session.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOW_CPUS = int(os.environ.get("SPARK_GRAFT_LOW_CPUS", "8"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from eget_crawler_for_overflow_spark import pagemodel as pm  # noqa: E402
from eget_crawler_for_overflow_spark.fixtures import load_pages, load_table  # noqa: E402
from eget_crawler_for_overflow_spark.functions.extract import (  # noqa: E402
    extract_page_udf,
)
from eget_crawler_for_overflow_spark.operators import dedup, similarity  # noqa: E402
from eget_crawler_for_overflow_spark.operators.chunker import chunks_table  # noqa: E402
from eget_crawler_for_overflow_spark.operators.frontier import (  # noqa: E402
    CrawlConfig,
    run_crawl,
)
from eget_crawler_for_overflow_spark.session import get_spark  # noqa: E402


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def extract_job(spark, pages):
    """The headline: full extraction bundle over every page, forced by an
    aggregate (no collect — output stays distributed)."""
    e = pages.select("url", extract_page_udf(F.col("html")).alias("e"))
    return e.select(
        F.sum(F.length("e.markdown")).alias("b"), F.count("*").alias("n")
    ).collect()[0]["n"]


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}

    # corpus materialization (cached parquet; excluded from query timings)
    t_gen, pages = timed(lambda: load_pages(spark, SF_DIR))
    n_pages = pages.count()

    # q1: headline extraction throughput
    t_extract, _ = timed(lambda: extract_job(spark, pages))
    queries["extract_all_pages"] = round(t_extract, 3)

    # q2: full crawl loop (frontier + seen anti-join + extraction + expand)
    _, n_hosts = pm.sizing(SF_DIR)
    seeds = [
        pm.url_of(i, n_hosts)
        for i in range(3000)
        if pm.host_of(i, n_hosts) == 0
    ][:100]
    cfg = CrawlConfig(max_depth=6, max_pages=20000, use_bloom=True)

    def crawl_job():
        # hot-cache the pages table for the generation loop: every wave
        # re-probes it, and at cluster scale Iceberg bucket pruning /
        # storage-partitioned joins play this role
        pages.persist()
        try:
            res = run_crawl(spark, pages, seeds, cfg)
            return res.extracted.filter(F.col("status") == "extracted").count()
        finally:
            pages.unpersist()

    t_crawl, n_crawled = timed(crawl_job)
    queries["crawl_bfs"] = round(t_crawl, 3)

    # q3: chunker over extracted markdown
    def chunk_job():
        md = pages.select("url", F.col("text").alias("markdown"))
        return chunks_table(md).groupBy("type").count().collect()

    t_chunk, _ = timed(chunk_job)
    queries["semantic_chunks"] = round(t_chunk, 3)

    # q4: MinHash near-dup over documents (+constructed near-dups)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    near = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra tail words here")).alias("text"),
        )
    )
    t_minhash, _ = timed(
        lambda: dedup.minhash_dedup(near, threshold_pct=60).count()
    )
    queries["dedup_minhash"] = round(t_minhash, 3)

    # q5: brute-force ANN over embeddings
    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    t_ann, _ = timed(lambda: similarity.ann_bruteforce(emb, qs, k=10).count())
    queries["ann_bruteforce"] = round(t_ann, 3)

    scaling = {}
    if RUN_SCALING:
        spark.stop()
        spark_low = get_spark(
            master=f"local[{LOW_CPUS}]", shuffle_partitions=LOW_CPUS
        )
        spark_low.sparkContext.setLogLevel("ERROR")
        pages_low = load_pages(spark_low, SF_DIR)
        t_low, _ = timed(lambda: extract_job(spark_low, pages_low))
        spark_low.stop()
        ratio = CPUS / LOW_CPUS
        eff = (t_low / t_extract) / ratio if t_extract > 0 else 0.0
        scaling = {
            "low_cpus": LOW_CPUS,
            "high_cpus": CPUS,
            "extract_sec_low": round(t_low, 3),
            "extract_sec_high": round(t_extract, 3),
            "pages_per_sec_low": round(n_pages / t_low, 1),
            "pages_per_sec_high": round(n_pages / t_extract, 1),
            "efficiency": round(eff, 3),
        }

    result = {
        "metric": "pages_extracted_per_sec",
        "value": round(n_pages / t_extract, 1),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("/")[-1],
        "n_pages": n_pages,
        "n_crawled": n_crawled,
        "gen_sec": round(t_gen, 3),
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
