"""Round-7 optimization harness (guide §1): per-query isolation with the
noop sink, labeled jobs, and per-stage breakdowns. bench.py is FROZEN for
measurement; every number quoted in OPTIMIZATION_r07.md that is not a
bench.py run comes from here.

Usage:
    python bench_extra.py [query ...]      # default: all
Env:
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS   (default 32)
    EXTRA_REPS         (default 2)
Queries: crawl_bfs, crawl_bfs_priority, crawl_bfs_bucketed, extract,
         chunks, minhash, minhash_stages, ann, ann_stages
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("EXTRA_REPS", "2"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from eget_crawler_for_overflow_spark import pagemodel as pm  # noqa: E402
from eget_crawler_for_overflow_spark.fixtures import load_pages, load_table  # noqa: E402
from eget_crawler_for_overflow_spark.functions.extract import extract_page_udf  # noqa: E402
from eget_crawler_for_overflow_spark.operators import dedup, similarity  # noqa: E402
from eget_crawler_for_overflow_spark.operators.chunker import chunks_table  # noqa: E402
from eget_crawler_for_overflow_spark.operators.frontier import (  # noqa: E402
    CrawlConfig,
    run_crawl,
)
from eget_crawler_for_overflow_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, reps=REPS, pre=None):
    ts = []
    for _ in range(reps):
        if pre is not None:
            pre()
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    load = round(os.getloadavg()[0], 2)
    print(f"{label}: {min(ts)} (reps={ts}, load={load})", flush=True)
    return min(ts)


def main() -> None:
    which = set(sys.argv[1:]) or {
        "crawl_bfs",
        "crawl_bfs_priority",
        "crawl_bfs_bucketed",
        "extract",
        "chunks",
        "minhash",
        "ann",
    }
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    pages = load_pages(spark, SF_DIR)
    # warmup python workers
    pages.limit(4000).select(extract_page_udf(F.col("html")).alias("e")).agg(
        F.count("e.markdown")
    ).collect()

    _, n_hosts = pm.sizing(SF_DIR)
    seeds = [pm.url_of(i, n_hosts) for i in range(100)]

    results = {}

    if {"crawl_bfs", "crawl_bfs_priority"} & which:
        pages.persist()
        pages.count()
    if "crawl_bfs" in which:
        cfg = CrawlConfig(
            max_depth=6, max_pages=200_000, same_domain=False, use_bloom=True
        )
        sc.setJobDescription("crawl_bfs")
        results["crawl_bfs"] = timed(
            "crawl_bfs",
            lambda: run_crawl(spark, pages, seeds, cfg)
            .extracted.filter(F.col("status") == "extracted")
            .count(),
            reps=max(REPS, 2),
        )
    if "crawl_bfs_priority" in which:
        cfg = CrawlConfig(
            max_depth=6,
            max_pages=200_000,
            same_domain=False,
            use_bloom=True,
            priority_depth_weight=0.25,
            priority_host_weight=1.0,
        )
        sc.setJobDescription("crawl_bfs_priority")
        results["crawl_bfs_priority"] = timed(
            "crawl_bfs_priority",
            lambda: run_crawl(spark, pages, seeds, cfg)
            .extracted.filter(F.col("status") == "extracted")
            .count(),
            reps=max(REPS, 2),
        )
    if {"crawl_bfs", "crawl_bfs_priority"} & which:
        pages.unpersist()

    if "crawl_bfs_bucketed" in which:
        tbl = "pages_bucketed_bench"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        t0 = time.time()
        (
            pages.select("url", "html")
            .repartition(CPUS, F.col("url"))
            .write.bucketBy(CPUS, "url")
            .sortBy("url")
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        print(f"bucketed_table_build: {time.time() - t0:.3f}", flush=True)
        bpages = spark.table(tbl)
        cfg = CrawlConfig(
            max_depth=6,
            max_pages=200_000,
            same_domain=False,
            use_bloom=True,
            broadcast_fetch_threshold=0,
        )
        sc.setJobDescription("crawl_bfs_bucketed")
        results["crawl_bfs_bucketed"] = timed(
            "crawl_bfs_bucketed",
            lambda: run_crawl(spark, bpages, seeds, cfg)
            .extracted.filter(F.col("status") == "extracted")
            .count(),
            reps=max(REPS, 2),
        )
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    if "extract" in which:
        sc.setJobDescription("extract_all_pages (noop)")
        e = pages.select("url", extract_page_udf(F.col("html")).alias("e"))
        results["extract_noop"] = timed("extract_all_pages_noop", lambda: noop(e))

    if "chunks" in which:
        sc.setJobDescription("semantic_chunks")
        md = pages.select("url", F.col("text").alias("markdown"))
        results["chunks"] = timed(
            "semantic_chunks",
            lambda: chunks_table(md).groupBy("type").count().collect(),
            pre=spark.catalog.clearCache,
        )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    near = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra tail words here")).alias("text"),
        )
    )

    if "minhash" in which:
        sc.setJobDescription("dedup_minhash")
        results["minhash"] = timed(
            "dedup_minhash",
            lambda: dedup.minhash_dedup(near, threshold_pct=60).count(),
            pre=spark.catalog.clearCache,
        )

    if "minhash_stages" in which:
        # stage breakdown: shingle+hash materialization, LSH candidates,
        # verify join — each isolated, cold per rep
        from eget_crawler_for_overflow_spark.operators.dedup import (
            minhash_lsh_candidates,
            minhash_signature,
            ngram_jaccard_pairs,
            shingle_hash_table,
        )

        def sh_df():
            return shingle_hash_table(near, "doc_id", "text", 3)

        def sig_only():
            sh = sh_df().persist()
            sh.count()
            noop(sh.select("id", minhash_signature(F.col("hv"), 16).alias("sig")))
            sh.unpersist()

        sc.setJobDescription("minhash: signatures only (from persisted sh)")
        timed("minhash_stage_signatures", sig_only, pre=spark.catalog.clearCache)

        sc.setJobDescription("minhash: shingles+md5 (noop)")
        timed("minhash_stage_shingles", lambda: noop(sh_df()),
              pre=spark.catalog.clearCache)

        def cand_cached():
            sh = sh_df().persist()
            c = minhash_lsh_candidates(near, shingles_df=sh)
            c.count()
            sh.unpersist()

        sc.setJobDescription("minhash: candidates (from persisted sh)")
        timed("minhash_stage_candidates", cand_cached,
              pre=spark.catalog.clearCache)

        def verify_full():
            sh = sh_df().persist()
            c = minhash_lsh_candidates(near, shingles_df=sh)
            n = ngram_jaccard_pairs(
                near, c, threshold_pct=60, shingles_df=sh
            ).count()
            sh.unpersist()
            return n

        sc.setJobDescription("minhash: full (explicit stages)")
        timed("minhash_stage_full", verify_full, pre=spark.catalog.clearCache)

    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    if "ann" in which:
        sc.setJobDescription("ann_bruteforce")
        results["ann"] = timed(
            "ann_bruteforce",
            lambda: similarity.ann_bruteforce(emb, qs, k=10).count(),
            pre=spark.catalog.clearCache,
        )

    print(json.dumps({"results": results, "sf": SF_DIR, "cpus": CPUS}))


if __name__ == "__main__":
    main()
