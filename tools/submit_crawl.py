"""spark-submit entry point for the crawl engine (north-rule launch shape).

Cluster usage:

    zip -r engine.zip eget_crawler_for_overflow_spark
    spark-submit --py-files engine.zip tools/submit_crawl.py \
        --pages /warehouse/pages --seeds https://host0.example/p/0 \
        --max-depth 6 --max-pages 100000 \
        --checkpoint /warehouse/crawl_ckpt --resume \
        --output /warehouse/extracted

Local smoke (sandbox):

    python tools/submit_crawl.py --sf-dir /root/testdata/sf0.001 \
        --seeds auto --max-depth 3 --output /tmp/extracted
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="path to a pages parquet/Iceberg table")
    ap.add_argument("--sf-dir", help="testdata dir to derive synthetic pages from")
    ap.add_argument("--seeds", nargs="+", required=True,
                    help="seed URLs, or 'auto' for the corpus' host0 seeds")
    ap.add_argument("--max-depth", type=int, default=3)
    ap.add_argument("--max-pages", type=int, default=None)
    ap.add_argument("--exclude", nargs="*", default=[])
    ap.add_argument("--include", nargs="*", default=[])
    ap.add_argument("--respect-robots", action="store_true")
    ap.add_argument("--robots", help="parquet table (host, rules_text)")
    ap.add_argument("--crawl-delay-window", type=float, default=None)
    ap.add_argument("--host-budget", type=int, default=None)
    ap.add_argument("--max-generations", type=int, default=64)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from eget_crawler_for_overflow_spark import pagemodel as pm
    from eget_crawler_for_overflow_spark.fixtures import load_pages
    from eget_crawler_for_overflow_spark.operators.frontier import (
        CrawlConfig,
        run_crawl,
    )

    spark = SparkSession.builder.appName("crawl").getOrCreate()
    if args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.sf_dir:
        pages = load_pages(spark, args.sf_dir)
    else:
        ap.error("one of --pages / --sf-dir is required")

    seeds = args.seeds
    if seeds == ["auto"]:
        _, n_hosts = pm.sizing(args.sf_dir or "")
        seeds = [pm.url_of(i, n_hosts) for i in (0, 2, 4)]

    robots = spark.read.parquet(args.robots) if args.robots else None
    cfg = CrawlConfig(
        max_depth=args.max_depth,
        max_pages=args.max_pages,
        exclude=tuple(args.exclude),
        include=tuple(args.include),
        respect_robots=args.respect_robots,
        crawl_delay_window=args.crawl_delay_window,
        host_budget=args.host_budget,
        max_generations=args.max_generations,
    )
    res = run_crawl(
        spark,
        pages,
        seeds,
        cfg,
        robots=robots,
        checkpoint_dir=args.checkpoint,
        resume=args.resume,
    )
    write_metrics = True
    if res.extracted is not None:
        res.extracted.write.mode("overwrite").parquet(args.output)
    else:
        # every seed was dropped by the invalid-URL guard (or depth 0 with
        # no admissible seeds): clean exit, and REMOVE any stale output so
        # a consumer can never pair an old extracted table with this run's
        # fresh metrics. Guard (ADVICE r3): only delete a path that looks
        # like a COMPLETE prior parquet output of this tool (_SUCCESS
        # marker) — a mistyped --output pointing at an unrelated directory
        # must never be silently destroyed. If an unrecognized/partial dir
        # is left in place, SKIP the metrics write too: fresh metrics next
        # to unverified output recreates the stale-pairing hazard the
        # removal exists to prevent. (Local-FS probe; on a DFS output,
        # clean the path explicitly before a re-run.)
        import os
        import shutil

        if os.path.exists(os.path.join(args.output, "_SUCCESS")):
            shutil.rmtree(args.output, ignore_errors=True)
            print("warning: nothing admitted — no extracted rows to write "
                  f"(stale {args.output} removed)")
        elif os.path.exists(args.output):
            write_metrics = False
            print("warning: nothing admitted, and existing "
                  f"{args.output} does not look like a complete prior "
                  "crawl output (no _SUCCESS) — leaving it untouched and "
                  "NOT writing metrics (clean the path and re-run)")
        else:
            print("warning: nothing admitted — no extracted rows to write")
    if write_metrics:
        res.metrics.write.mode("overwrite").parquet(args.output + "_metrics")
    print(
        f"crawl done: generations={res.generations} "
        f"admitted={res.stats['admitted']} → {args.output}"
    )


if __name__ == "__main__":
    main()
