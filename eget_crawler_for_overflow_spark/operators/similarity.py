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

from .dedup import cosine_sim, py_vec_norm, vec_dot, vec_norm

def _cos_parts() -> Column:
    """Per-pair cosine = dot / (qn * cn) with BOTH norms computed once per
    input row, before the join (r7): cosine_sim's norm subexpressions run
    on the interpreted higher-order-function path, so evaluating them per
    candidate pair tripled the scoring stage's work. Same left-fold
    arithmetic, same operand order (query norm × corpus norm) —
    bit-identical scores."""
    return vec_dot(F.col("qv"), F.col("cv")) / (
        F.col("__qn") * F.col("__cn")
    )


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
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        vec_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", _cos_parts())
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


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer:
    centroids init from the first k corpus vectors (no RNG — plans and
    tests replay identically), then ``iters`` rounds of
    assign (broadcast centroids, argmin cosine distance) → groupBy mean.
    Each round is one shuffle of (cell, vec) — linear scans, no cross
    join materialization."""
    cents = default_anchors(corpus, b=k, vec_col=vec_col, id_col=id_col)
    vecs = corpus.select(F.col(vec_col).alias("v"))
    for _ in range(iters):
        assigned = vecs.withColumn(
            "cell", _nearest_cell(F.col("v"), cents)
        )
        dim = len(cents[0])
        agg = assigned.groupBy("cell").agg(
            *[
                F.avg(F.element_at(F.col("v"), i + 1).cast("double")).alias(
                    f"c{i}"
                )
                for i in range(dim)
            ]
        )
        got = {
            int(r["cell"]): [float(r[f"c{i}"]) for i in range(dim)]
            for r in agg.collect()
        }
        cents = [got.get(j, cents[j]) for j in range(k)]  # keep empty cells
    return cents


def _nearest_cell(
    vec: Column, centroids: list[list[float]], norm_col: Column | None = None
) -> Column:
    """argmin over centroids of negative cosine (ties → lowest cell id).

    ``norm_col`` (r7): a precomputed ``vec_norm(vec)`` column, so the row's
    own norm is evaluated once instead of once per centroid; centroid norms
    are literal constants (``py_vec_norm`` is the same left-fold, so every
    distance — and therefore every cell assignment — is bit-identical)."""
    na = vec_norm(vec) if norm_col is None else norm_col
    scored = [
        F.struct(
            (-(
                vec_dot(
                    vec,
                    F.array(*[F.lit(float(x)) for x in c]).cast(
                        "array<double>"
                    ),
                )
                / (na * F.lit(py_vec_norm(c)))
            )).alias("d"),
            F.lit(j).alias("cell"),
        )
        for j, c in enumerate(centroids)
    ]
    best = F.aggregate(
        F.array(*scored),
        F.struct(F.lit(float("inf")).alias("d"), F.lit(-1).alias("cell")),
        lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc),
    )
    return best["cell"]


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF: corpus vectors live in their nearest-centroid cell; each query
    probes its ``nprobe`` closest cells and ranks only those candidates.
    The scale path when LSH signature buckets are too coarse: candidate
    count ≈ corpus * nprobe / n_cells per query, tunable recall/cost."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("__cn"),
    ).withColumn(
        "cell", _nearest_cell(F.col("cv"), centroids, norm_col=F.col("__cn"))
    )
    probe_cells = [
        F.struct(
            (-(
                vec_dot(
                    F.col("qv"),
                    F.array(*[F.lit(float(x)) for x in cent]).cast(
                        "array<double>"
                    ),
                )
                / (F.col("__qn") * F.lit(py_vec_norm(cent)))
            )).alias("d"),
            F.lit(j).alias("cell"),
        )
        for j, cent in enumerate(centroids)
    ]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        vec_norm(F.col(vec_col)).alias("__qn"),
    ).withColumn(
        "cell",
        F.explode(
            F.slice(
                F.array_sort(F.array(*probe_cells)).getField("cell"),
                1,
                nprobe,
            )
        ),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", _cos_parts())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


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
        vec_norm(F.col(vec_col)).alias("__cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bits(F.col(vec_col), anchors).alias("bucket"),
        vec_norm(F.col(vec_col)).alias("__qn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", _cos_parts())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
