"""Deduplication operators for large-scale text corpora.

All hot-path math uses built-in ``pyspark.sql.functions`` (JVM, codegen):
md5 as the engine-portable hash (DuckDB computes the identical digest, so
every operator here is oracle-checkable), integer cross-multiplication
instead of float ratios (bit-exact thresholds), and band-bucket self-joins
instead of quadratic pair scans.

Scale notes per operator:
* exact: one hash-aggregate — the partial/final combine makes the shuffle
  carry one row per distinct digest, not per row;
* MinHash+LSH: signatures are per-row projections (no shuffle); the only
  shuffle is the band-bucket self-join, whose key cardinality is tuned by
  (bands, rows-per-band); candidate pairs then verify with exact Jaccard;
* SimHash: per-row signature + bit_count(xor) on candidate pairs;
* n-gram Jaccard: verification primitive (array_intersect/union on
  distinct shingles);
* embedding cosine: zip_with/aggregate dot products on candidate pairs.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One survivor (min id) per distinct text. Returns
    (fingerprint, keep_id, n_copies)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# shingling + Jaccard (verification primitive)
# ---------------------------------------------------------------------------


def word_shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-grams, built-ins only: split → sliding join."""
    words = F.split(F.trim(text_col), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(F.array(F.concat_ws(" ", words)))
    )


# Java-regex \s character class (what F.split compiles): ASCII-only, unlike
# Python's unicode-aware \s — the kernel below must split EXACTLY like the
# Column expression it replaces.
_JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")

SHINGLE_HASH_SCHEMA = T.StructType(
    [
        T.StructField("sh", T.ArrayType(T.StringType())),
        T.StructField("hv", T.ArrayType(T.LongType())),
    ]
)


def _shingle_hash_one(t: str | None, n: int) -> tuple[list[str], list[int]]:
    """Value-exact mirror of ``word_shingles`` + ``shingle_base_hash``:

    * SQL ``trim`` strips only ASCII spaces → ``t.strip(" ")``;
    * ``F.split(_, r"\\s+")`` is Java regex (ASCII \\s) with limit -1
      (trailing empties kept) → ``_JAVA_WS_RE.split`` matches both;
    * n-grams in order, ``array_distinct`` keeps first occurrence →
      ``dict.fromkeys``; size < n falls back to one whole-text gram
      (``concat_ws`` of a null array is "" — the None branch mirrors it);
    * base hash = first 7 md5 hex chars as int (identical in DuckDB).
    """
    if t is None:
        sh = [""]
    else:
        words = _JAVA_WS_RE.split(t.strip(" "))
        if len(words) >= n:
            sh = list(
                dict.fromkeys(
                    " ".join(words[i : i + n])
                    for i in range(len(words) - n + 1)
                )
            )
        else:
            sh = [" ".join(words)]
    hv = [
        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:7], 16) for g in sh
    ]
    return sh, hv


def make_shingle_hash_udf(n: int = 3):
    """Arrow-batched shingle+hash kernel (optimization-guide §4.2): the
    Column-expression form (``word_shingles``→``shingle_base_hash``) runs
    through interpreted higher-order functions — measured ~300 core-seconds
    for ~520k shingles at sf0.1, ~500× slower per core than this plain
    Python loop. Same values bit-for-bit (differential pytest)."""

    @F.pandas_udf(SHINGLE_HASH_SCHEMA)
    def udf(text: pd.Series) -> pd.DataFrame:
        pairs = [_shingle_hash_one(t, n) for t in text]
        return pd.DataFrame(
            {"sh": [p[0] for p in pairs], "hv": [p[1] for p in pairs]}
        )

    return udf


def shingle_hash_table(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, sh, hv) via the Arrow kernel — the shared first stage of every
    MinHash/Jaccard operator."""
    return df.select(
        F.col(id_col).alias("id"),
        make_shingle_hash_udf(n)(F.col(text_col)).alias("s"),
    ).select("id", F.col("s.sh").alias("sh"), F.col("s.hv").alias("hv"))


def make_minhash_table_udf(n: int = 3, num_perm: int = 16):
    """Shingles + the full MinHash signature in ONE Arrow pass: the
    ``minhash_signature`` Column form is num_perm interpreted
    transform/array_min evaluations over the hv array (~1.5 s of the sf0.1
    dedup_minhash query on its own); here the affine maps run as one numpy
    outer product per row. a_p < 2^21 and h < 2^28, so a_p*h + b_p stays
    far inside int64 — the % MINHASH_M result is bit-identical to the JVM
    expression (differential pytest)."""
    import numpy as np

    a = np.array([minhash_a(p) for p in range(num_perm)], dtype=np.int64)
    b = np.array([minhash_b(p) for p in range(num_perm)], dtype=np.int64)

    schema = T.StructType(
        [
            T.StructField("sh", T.ArrayType(T.StringType())),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    @F.pandas_udf(schema)
    def udf(text: pd.Series) -> pd.DataFrame:
        shs, sigs = [], []
        for t in text:
            sh, hv = _shingle_hash_one(t, n)
            h = np.asarray(hv, dtype=np.int64)
            sig = ((a[:, None] * h[None, :] + b[:, None]) % MINHASH_M).min(
                axis=1
            )
            shs.append(sh)
            sigs.append(sig.tolist())
        return pd.DataFrame({"sh": shs, "sig": sigs})

    return udf


def jaccard_counts(a: Column, b: Column) -> tuple[Column, Column]:
    """(|A∩B|, |A∪B|) as integers — compare thresholds by
    cross-multiplication, never float division."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter, union


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,  # (id_a, id_b)
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_pct: int = 80,
    shingles_df: DataFrame | None = None,  # precomputed (id, sh)
) -> DataFrame:
    """Exact n-gram Jaccard over given candidate pairs; keeps pairs with
    jaccard >= threshold_pct/100 (integer compare)."""
    sh = (
        shingles_df
        if shingles_df is not None
        else shingle_hash_table(df, id_col, text_col, n)
    )
    sh = sh.select("id", "sh")  # drop any carried hv column before self-join
    j = (
        pairs.join(sh.withColumnRenamed("sh", "sh_a"), pairs["id_a"] == sh["id"])
        .drop("id")
        .join(
            sh.withColumnRenamed("sh", "sh_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    inter, union = jaccard_counts(F.col("sh_a"), F.col("sh_b"))
    return (
        j.select(
            "id_a",
            "id_b",
            inter.alias("n_intersect"),
            union.alias("n_union"),
        )
        .filter(F.col("n_intersect") * 100 >= F.lit(threshold_pct) * F.col("n_union"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# affine-permutation family over a single md5-derived base hash: ONE digest
# per shingle (instead of num_perm digests), then num_perm cheap integer
# maps (a_p*h + b_p) mod M — pure JVM codegen arithmetic. Constants are
# sized so a_p*h never leaves int64 (h < 2^28 from 7 hex chars, a_p < 2^21);
# M = 2^31-1 (Mersenne prime). At the 10^10-URL design point widen h to
# 60 bits with two-limb arithmetic; 28 bits is collision-fine for shingle
# universes up to ~10^7 (collisions merely merge two shingles).
MINHASH_M = 2_147_483_647


def minhash_a(p: int) -> int:
    return 1_000_003 + 7_919 * p


def minhash_b(p: int) -> int:
    return 12_345 + 104_729 * p


def shingle_base_hash(shingles: Column) -> Column:
    """array<long> base hashes: first 7 md5 hex chars as an integer —
    identical in DuckDB ('0x'||substr(md5(s),1,7))::BIGINT, keeping every
    MinHash oracle exact."""
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long"),
    )


def minhash_signature(hv: Column, num_perm: int = 16) -> Column:
    """num_perm min-hashes over precomputed base hashes ``hv``."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    hv,
                    lambda x: (
                        F.lit(minhash_a(p)) * x + F.lit(minhash_b(p))
                    ) % F.lit(MINHASH_M),
                )
            )
            for p in range(num_perm)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Band-bucket candidate pairs (id_a < id_b). rows_per_band =
    num_perm/bands; a pair collides iff some band's sub-signature matches
    exactly — the classic S-curve knob."""
    rows_per_band = num_perm // bands
    sh = (
        shingles_df
        if shingles_df is not None
        else shingle_hash_table(df, id_col, text_col, n)
    )
    if "sig" in sh.columns:
        # precomputed by the Arrow kernel (make_minhash_table_udf) — skips
        # num_perm interpreted transform/array_min passes per row
        sig = sh.select("id", "sig")
    else:
        hv = (
            F.col("hv")
            if "hv" in sh.columns
            else shingle_base_hash(F.col("sh"))
        )
        sig = sh.select("id", minhash_signature(hv, num_perm).alias("sig"))
    band_rows = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[
                                F.element_at(
                                    F.col("sig"), b * rows_per_band + r + 1
                                )
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = band_rows.withColumnRenamed("id", "id_a")
    right = band_rows.withColumnRenamed("id", "id_b")
    return (
        left.join(right, on=["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold_pct: int = 80,
) -> DataFrame:
    """LSH candidates → exact-Jaccard verification. Returns confirmed
    near-dup pairs with integer intersect/union counts.

    The shingle array AND its base-hash array are computed ONCE — by the
    Arrow-batched kernel (``make_shingle_hash_udf``; the Column-expression
    chain ran through interpreted higher-order functions, ~35× the total
    query time) — and persisted: without the persist barrier the opaque
    UDF would re-run for the signature pass and again for the
    verification join. The permutations run as one numpy outer product
    per row inside the same pass (bit-identical to the JVM affine maps)."""
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            make_minhash_table_udf(n, num_perm)(F.col(text_col)).alias("s"),
        )
        .select("id", F.col("s.sh").alias("sh"), F.col("s.sig").alias("sig"))
        .persist()
    )
    cand = minhash_lsh_candidates(
        df, id_col, text_col, n, num_perm, bands, shingles_df=sh
    )
    return ngram_jaccard_pairs(
        df, cand, id_col, text_col, n, threshold_pct, shingles_df=sh
    )


# ---------------------------------------------------------------------------
# connected components over dup pairs → dedup survivors
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame, max_iters: int = 20
) -> DataFrame:
    """(id_a, id_b) undirected dup edges → (id, component) where component
    is the min id reachable. Iterative min-label propagation (the classic
    Pregel-style loop, like GraphX CC): each round is one join + one
    min-aggregate, converging in O(component diameter) rounds — near-dup
    clusters are shallow, so this terminates in a few rounds even at
    corpus scale. Driver only checks the convergence counter."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        msgs = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("new_component"))
        )
        joined = labels.join(msgs, on="id", how="left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("new_component"), F.col("component"))
            ).alias("component"),
            (F.coalesce(F.col("new_component"), F.col("component"))
             < F.col("component")).alias("changed"),
        )
        joined = joined.localCheckpoint(eager=True)
        n_changed = joined.filter(F.col("changed")).count()
        labels = joined.drop("changed")
        if n_changed == 0:
            break
    return labels


def dedup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per near-dup component; rows that
    appear in no dup pair survive untouched. Returns (id, component,
    is_survivor)."""
    cc = connected_components(pairs)
    ids = df.select(F.col(id_col).alias("id"))
    labeled = ids.join(cc, on="id", how="left").select(
        "id", F.coalesce(F.col("component"), F.col("id")).alias("component")
    )
    return labeled.withColumn(
        "is_survivor", F.col("id") == F.col("component")
    )


# ---------------------------------------------------------------------------
# SimHash (32-bit, md5-derived — portable to the DuckDB oracle)
# ---------------------------------------------------------------------------


def simhash32(text_col: Column) -> Column:
    """Per-word 32-bit hash = first 8 md5 hex chars; signature bit j set
    iff sum over words of ±1 (bit j of word hash) is positive. Built-ins
    only — and single-pass: one md5 per word, with the 32 per-bit sums
    carried as an array accumulator through ONE aggregate (the naive
    32-separate-aggregates formulation makes Catalyst inline and recompute
    the md5 transform 32x)."""
    words = F.array_distinct(F.split(F.trim(F.lower(text_col)), r"\s+"))
    hashes = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
    )
    pows = F.array(*[F.lit(1 << j).cast("long") for j in range(32)])
    # floor(h / 2^j) == h >> j for nonneg h; double math exact below 2^53
    bit_sums = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 32),
        lambda acc, h: F.zip_with(
            acc, pows, lambda a, p: a + (F.floor(h / p) % 2 * 2 - 1)
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_sums,
            pows,
            lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Hamming distance over candidate pairs via bit_count(xor)."""
    sh = df.select(F.col(id_col).alias("id"), simhash32(F.col(text_col)).alias("sh"))
    j = (
        pairs.join(sh.withColumnRenamed("sh", "sh_a"), pairs["id_a"] == sh["id"])
        .drop("id")
        .join(
            sh.withColumnRenamed("sh", "sh_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return j.select(
        "id_a", "id_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def vec_dot(a: Column, b: Column) -> Column:
    """Left-fold dot product — the exact summation order every cosine in
    this package uses (and the DuckDB oracles replay)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: Column) -> Column:
    """sqrt of the left-fold sum of squares — bit-identical to the norm
    subexpression of ``cosine_sim``, exposed so join pipelines can compute
    each row's norm ONCE before the join instead of once per candidate
    pair (r7 optimization; guide §2.3 'shuffle fewer bytes / per-task
    work': the aggregate runs on the interpreted higher-order-function
    path, so per-pair recomputation dominated the scoring stage)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def py_vec_norm(v: list[float]) -> float:
    """Driver-side ``vec_norm`` for literal vectors (e.g. IVF centroids):
    the same left-fold double sum + sqrt, so a precomputed literal norm is
    bit-identical to the expression it replaces."""
    import math

    acc = 0.0
    for x in v:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def cosine_sim(a: Column, b: Column) -> Column:
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))


def embedding_dup_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    # per-row norm computed once in the scan projection (r7), not per
    # candidate pair in the filter — same left-fold arithmetic, same
    # (norm_a * norm_b) operand order as cosine_sim
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        vec_norm(F.col(vec_col)).alias("n"),
    )
    j = (
        pairs.join(
            e.withColumnRenamed("v", "v_a").withColumnRenamed("n", "n_a"),
            pairs["id_a"] == e["id"],
        )
        .drop("id")
        .join(
            e.withColumnRenamed("v", "v_b")
            .withColumnRenamed("n", "n_b")
            .withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    return j.filter(
        vec_dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
        >= F.lit(threshold)
    ).select("id_a", "id_b")


def embedding_dup_pairs_lsh(
    df: DataFrame,
    anchors: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Scale path for embedding near-dup: random-hyperplane sign buckets
    replace the all-pairs cross product — candidates must share the full
    b-bit signature (identical/near-identical vectors always do), then
    exact cosine confirms. The self-join key cardinality is 2^b, the same
    recall-for-shuffle trade as MinHash banding."""
    from .similarity import lsh_bits

    c = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bits(F.col(vec_col), anchors).alias("bucket"),
        vec_norm(F.col(vec_col)).alias("n"),  # once per row, not per pair
    )
    left = c.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"),
        F.col("n").alias("n_a"), "bucket",
    )
    right = c.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"),
        F.col("n").alias("n_b"), "bucket",
    )
    return (
        left.join(right, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            vec_dot(F.col("v_a"), F.col("v_b"))
            / (F.col("n_a") * F.col("n_b"))
            >= F.lit(threshold)
        )
        .select("id_a", "id_b")
    )
