"""Similarity search over an embedding column (``array<float>``).

* ``ann_bruteforce`` — exact cosine top-k: query set broadcast against the
  corpus scan, per-partition heaps via window rank. The baseline every
  approximate method is measured against.
* ``ann_lsh`` — random-hyperplane (sign-bit) LSH: each vector gets a
  b-bit signature from sign(v·anchor_j); candidates share a bucket, top-k
  computed within bucket. At 100 TB the bucket join replaces the full
  cross product — the classic recall-for-shuffle trade.

Anchors default to the first ``b`` corpus vectors (deterministic — no RNG
in engine code so plans replay identically; see Workflow/testing notes).
Dot products run in zip_with/aggregate (JVM); no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_sim


def ann_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact top-k by cosine, self
    excluded, ties broken by neighbor id (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_sim(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_bits(vec: Column, anchors: list[list[float]]) -> Column:
    """b-bit signature: bit j = 1 iff v · anchor_j > 0."""
    sig = F.lit(0).cast("long")
    for j, a in enumerate(anchors):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in a]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return sig


def default_anchors(corpus: DataFrame, b: int = 8, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> list[list[float]]:
    rows = (
        corpus.orderBy(id_col).select(vec_col).limit(b).collect()
    )
    return [list(r[0]) for r in rows]


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    anchors: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed approximate top-k: candidates must share the full
    signature bucket with the query. Returns (query_id, neighbor_id,
    rank) ranked within bucket; queries whose bucket has no other member
    return no rows (recall trade-off, measured in tests vs bruteforce)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bits(F.col(vec_col), anchors).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bits(F.col(vec_col), anchors).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_sim(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
