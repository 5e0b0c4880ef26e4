"""Dedup + similarity semantics on handcrafted frames (Spark)."""

import pytest
from pyspark.sql import functions as F

from eget_crawler_for_overflow_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (3, "completely different words entirely here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs_df):
    out = {r["keep_id"]: r["n_copies"] for r in dedup.exact_dedup(docs_df).collect()}
    assert out[0] == 2  # 0 and 1 collapse, min id survives
    assert out[2] == 1 and out[3] == 1


def test_minhash_finds_near_dup_not_unrelated(docs_df):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dedup(docs_df, threshold_pct=50).collect()
    }
    assert (0, 1) in pairs
    assert all(3 not in p for p in pairs)


def test_jaccard_counts_exact(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e f")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    r = dedup.ngram_jaccard_pairs(df, pairs, threshold_pct=50).collect()[0]
    # shingles: {abc,bcd,cde} vs {abc,bcd,cde,def} → 3/4
    assert (r["n_intersect"], r["n_union"]) == (3, 4)


def test_simhash_identical_texts_zero_hamming(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "zeta eta theta iota")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(0, 1), (0, 2)], "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(df, pairs, max_hamming=32).collect()
    }
    assert got[(0, 1)] == 0
    assert got[(0, 2)] > 0


def test_ann_bruteforce_self_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # anti-parallel
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    got = [
        (r["neighbor_id"], r["rank"])
        for r in similarity.ann_bruteforce(df, q, k=3).orderBy("rank").collect()
    ]
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_ann_lsh_recall_vs_bruteforce(spark, sf01):
    emb = spark.read.parquet(f"{sf01}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_bruteforce(emb, qs, k=5).collect()
    }
    anchors = similarity.default_anchors(emb, b=4)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_lsh(emb, qs, anchors, k=5).collect()
    }
    # LSH is approximate: candidates come only from the same bucket, but
    # whatever it returns must be a plausible neighbor set (sanity: overlap
    # with brute-force nonzero at 4 bits / 16 buckets over 500 vecs)
    assert approx and len(approx & brute) > 0


def test_connected_components_chain_and_cycle(spark):
    from eget_crawler_for_overflow_spark.operators.dedup import (
        connected_components,
        dedup_survivors,
    )

    # chain 1-2-3-4, cycle 10-11-12-10, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        "id_a long, id_b long",
    )
    cc = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 4, 10, 11, 12, 20, 21, 99)],
        "doc_id long, text string",
    )
    surv = {
        r["id"]: r["is_survivor"] for r in dedup_survivors(docs, pairs).collect()
    }
    assert [k for k, v in sorted(surv.items()) if v] == [1, 10, 20, 99]


def test_ann_ivf_recall_vs_bruteforce(spark, sf01):
    emb = spark.read.parquet(f"{sf01}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_bruteforce(emb, qs, k=5).collect()
    }
    cents = similarity.kmeans_centroids(emb, k=8, iters=3)
    assert len(cents) == 8
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_ivf(emb, qs, cents, k=5, nprobe=2).collect()
    }
    # every query must return k results, and probing 2/8 cells should
    # recover a solid fraction of the true neighbors
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.4, recall
    # determinism: identical second run
    ivf2 = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_ivf(emb, qs, cents, k=5, nprobe=2).collect()
    }
    assert ivf == ivf2


def test_shingle_kernel_matches_column_expression(spark):
    """r7 optimization: the Arrow shingle+md5 kernel must be value-exact vs
    the Column-expression form it replaced (word_shingles +
    shingle_base_hash), including whitespace/null/dedup corner cases —
    notably unicode whitespace (\\xa0), where Python's \\s and Java's \\s
    disagree and the kernel must follow Java."""
    rows = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "one two"),
        (4, "\ta\tb c\nd  e\x0b f\r\ng "),
        (5, "a a a a a a"),
        (6, "x \xa0 y z w"),
        (7, "the quick brown fox jumps over the lazy dog"),
        (8, "trailing tab then\twords here\t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = df.select(
        F.col("doc_id").alias("id"),
        dedup.word_shingles(F.col("text"), 3).alias("sh"),
    ).withColumn("hv", dedup.shingle_base_hash(F.col("sh")))
    new = dedup.shingle_hash_table(df, "doc_id", "text", 3)
    j = old.alias("o").join(new.alias("n"), on="id")
    bad = j.filter(
        ~(
            F.col("o.sh").eqNullSafe(F.col("n.sh"))
            & F.col("o.hv").eqNullSafe(F.col("n.hv"))
        )
    ).count()
    assert bad == 0
    assert j.count() == len(rows)


def test_minhash_sig_kernel_matches_column_expression(spark):
    """r7: the numpy MinHash signature inside make_minhash_table_udf must
    equal the minhash_signature Column expression bit-for-bit."""
    rows = [
        (0, None),
        (1, ""),
        (2, "one two"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "a a a a a a"),
        (5, "x \xa0 y z w lorem ipsum dolor sit amet"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = dedup.shingle_hash_table(df, "doc_id", "text", 3).select(
        "id", dedup.minhash_signature(F.col("hv"), 16).alias("sig")
    )
    new = df.select(
        F.col("doc_id").alias("id"),
        dedup.make_minhash_table_udf(3, 16)(F.col("text")).alias("s"),
    ).select("id", F.col("s.sig").alias("sig"))
    j = old.alias("o").join(new.alias("n"), on="id")
    assert j.filter(~F.col("o.sig").eqNullSafe(F.col("n.sig"))).count() == 0
    assert j.count() == len(rows)
