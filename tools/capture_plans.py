"""Capture .explain('formatted') output for declared queries into
plans/r07/<query>_<suffix>.txt (judge evidence for OPTIMIZATION_r07.md).

Usage: python tools/capture_plans.py <suffix> [query ...]
       (default: a curated set of the queries being optimized)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "dedup_minhash",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "dedup_components",
    "events_summary",
    "training_pipeline",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from eget_crawler_for_overflow_spark.queries import QUERIES
    from eget_crawler_for_overflow_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r07",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)", flush=True)


if __name__ == "__main__":
    main()
