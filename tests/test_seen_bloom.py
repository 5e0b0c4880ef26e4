"""Bloom shard unit behavior: no false negatives ever; fpp sane."""

import numpy as np

from eget_crawler_for_overflow_spark.operators.seen import BloomShard


def test_no_false_negatives():
    b = BloomShard(expected_n=10_000)
    rng = np.random.default_rng(42)
    keys = rng.integers(0, 2**63, 10_000, dtype=np.int64).view(np.uint64)
    b.add(keys)
    assert b.maybe_contains(keys).all()


def test_false_positive_rate_reasonable():
    b = BloomShard(expected_n=10_000)
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**62, 10_000, dtype=np.int64).view(np.uint64)
    b.add(keys)
    probe = (
        rng.integers(2**62, 2**63, 20_000, dtype=np.int64).view(np.uint64)
    )
    fpp = b.maybe_contains(probe).mean()
    assert fpp < 0.01  # 13 bits/key, k=7 → ~1e-3 theoretical


def test_empty_shard():
    b = BloomShard(expected_n=100)
    assert not b.maybe_contains(np.array([1, 2, 3], dtype=np.uint64)).any()
    assert b.maybe_contains(np.array([], dtype=np.uint64)).shape == (0,)


# ---------------------------------------------------------------------------
# file-backed bloom storage (the 10^10-URL design point, VERDICT r2 §next-2)
# ---------------------------------------------------------------------------

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from eget_crawler_for_overflow_spark import pagemodel as pm  # noqa: E402
from eget_crawler_for_overflow_spark.fixtures import load_pages  # noqa: E402
from eget_crawler_for_overflow_spark.operators.frontier import (  # noqa: E402
    CrawlConfig,
    run_crawl,
)
from eget_crawler_for_overflow_spark.operators.seen import SeenSet  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):
    return load_pages(spark, SF)


def test_file_bits_equal_broadcast_bits(spark, pages):
    """Same deltas through both storage mechanisms -> identical bitmaps
    (the files are just the un-merged broadcast, relocated executor-side)."""
    delta = (
        pages.select("url")
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", F.lit("h"))
    )
    bc = SeenSet(spark, n_shards=8, use_bloom=True, bloom_storage="broadcast")
    fi = SeenSet(spark, n_shards=8, use_bloom=True, bloom_storage="files")
    try:
        half = delta.filter(F.col("url_hash") % 2 == 0)
        rest = delta.filter(F.col("url_hash") % 2 != 0)
        for part in (half, rest):  # two generations of appends
            bc.add(part)
            fi.add(part)
        assert (fi.merged_file_bits() == bc.bits).all()
        assert fi.count == bc.count
    finally:
        bc.drop()
        fi.drop()


def test_filter_unseen_files_equals_broadcast(spark, pages):
    cand = (
        pages.select("url")
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", F.lit("h"))
    )
    seenpart = cand.filter(F.col("url_hash") % 3 == 0)
    bc = SeenSet(spark, n_shards=8, use_bloom=True, bloom_storage="broadcast")
    fi = SeenSet(spark, n_shards=8, use_bloom=True, bloom_storage="files")
    try:
        bc.add(seenpart)
        fi.add(seenpart)
        got_bc = sorted(r["url"] for r in bc.filter_unseen(cand).collect())
        got_fi = sorted(r["url"] for r in fi.filter_unseen(cand).collect())
        assert got_bc == got_fi
        expect = sorted(
            r["url"] for r in cand.join(seenpart.select("url_hash"),
                                        on="url_hash", how="left_anti").collect()
        )
        assert got_fi == expect
    finally:
        bc.drop()
        fi.drop()


def test_crawl_identical_under_file_blooms(spark, pages):
    """Full engine crawl: file-backed blooms must not change one admitted
    row or seq (bloom is a pure prefilter; the anti-join is the truth)."""
    _, n_hosts = pm.sizing(SF)
    seeds = [pm.url_of(i, n_hosts) for i in (0, 2, 4)]

    def admitted(storage):
        cfg = CrawlConfig(
            max_depth=3, max_pages=None, use_bloom=True, bloom_storage=storage
        )
        res = run_crawl(spark, pages, seeds, cfg)
        return sorted(
            (r["url"], r["depth"], r["enqueue_seq"])
            for r in res.admitted.collect()
        )

    assert admitted("files") == admitted("broadcast")


# ---------------------------------------------------------------------------
# compaction (Iceberg rewrite_data_files analog, VERDICT r2 §next-3)
# ---------------------------------------------------------------------------


def _table_files(spark, table):
    import glob
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    return [
        f
        for f in glob.glob(os.path.join(wh, table, "**", "*"), recursive=True)
        if os.path.isfile(f)
        and not os.path.basename(f).startswith(("_", "."))  # _SUCCESS, .crc
    ]


def test_compaction_bounds_file_count_and_preserves_membership(spark, pages):
    n_shards, every = 4, 3
    delta = (
        pages.select("url")
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", F.lit("h"))
    )
    s = SeenSet(
        spark,
        n_shards=n_shards,
        use_bloom=True,
        bloom_storage="files",
        compact_every=every,
    )
    tables, file_counts = [], []
    try:
        for gen in range(7):  # 7 appends -> compactions after gens 3 and 6
            s.add(delta.filter(F.col("url_hash") % 7 == gen))
            tables.append(s.table)
            file_counts.append(len(_table_files(spark, s.table)))
        assert len(set(tables)) == 3  # base, _c1, _c2
        assert max(file_counts) <= n_shards * (every + 1)
        assert file_counts[-1] <= n_shards * 2  # compacted + 1 append
        # bloom deltas compacted too: exactly one parquet per shard + 1 gen
        import glob

        bloom_files = glob.glob(f"{s.bloom_dir}/shard=*/*.parquet")
        assert len(bloom_files) <= n_shards * 2
        # membership is untouched by compaction (note: Spark % on a
        # negative hash yields a NEGATIVE residue, so gens 0..6 covered
        # only the non-negative residues — the rest must still be unseen)
        got = sorted(r["url"] for r in s.filter_unseen(delta).collect())
        expect = sorted(
            r["url"]
            for r in delta.filter(F.col("url_hash") % 7 < 0).collect()
        )
        assert expect  # the negative-residue remainder is non-empty
        assert got == expect
    finally:
        s.drop()


def test_crawl_identical_under_compaction(spark, pages):
    """Engine-level: compaction every 2 generations changes no admitted
    row/seq and keeps the politeness-deferred multi-generation drain
    intact."""
    _, n_hosts = pm.sizing(SF)
    seeds = [pm.url_of(i, n_hosts) for i in (0, 2, 4)]

    def admitted(compact_every):
        cfg = CrawlConfig(
            max_depth=3,
            max_pages=None,
            use_bloom=True,
            seen_compact_every=compact_every,
        )
        res = run_crawl(spark, pages, seeds, cfg)
        return sorted(
            (r["url"], r["depth"], r["enqueue_seq"])
            for r in res.admitted.collect()
        )

    assert admitted(2) == admitted(None)


def test_files_mode_fails_loud_on_unreadable_manifest_file(spark, pages):
    """ADVICE r3: the per-shard file manifest is enumerated on the DRIVER
    and closed over into the membership task; a manifest file an executor
    cannot read must raise — never degrade to an all-zero bitmap that
    marks seen URLs 'definitely new' and bypasses the exact anti-join."""
    import os

    import pytest

    cand = (
        pages.select("url")
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", F.lit("h"))
    )
    s = SeenSet(spark, n_shards=4, use_bloom=True, bloom_storage="files")
    try:
        s.add(cand.limit(200))
        out = s.filter_unseen(cand)  # manifest captured at plan time
        import glob

        victim = sorted(glob.glob(f"{s.bloom_dir}/shard=*/*.parquet"))[0]
        os.remove(victim)
        with pytest.raises(Exception, match="(?i)parquet|no such file|error"):
            out.collect()
    finally:
        s.drop()


def test_long_crawl_compaction_24_generations(spark, pages):
    """Design-point generation count (VERDICT r3 item 7): 24 files-mode
    appends with compact_every=4 — file count stays bounded by
    n_shards × (compact_every + 1) throughout, bloom delta files stay
    bounded, and membership is byte-identical to an uncompacted
    broadcast-mode set fed the same deltas."""
    n_shards, every, gens = 4, 4, 24
    delta = (
        pages.select("url")
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", F.lit("h"))
    )
    fi = SeenSet(
        spark,
        n_shards=n_shards,
        use_bloom=True,
        bloom_storage="files",
        compact_every=every,
    )
    bc = SeenSet(spark, n_shards=n_shards, use_bloom=True,
                 bloom_storage="broadcast")
    try:
        import glob

        for g in range(gens):
            part = delta.filter(F.pmod(F.col("url_hash"), F.lit(gens)) == g)
            fi.add(part)
            bc.add(part)
            assert len(_table_files(spark, fi.table)) <= n_shards * (every + 1)
            bloom_files = glob.glob(f"{fi.bloom_dir}/shard=*/*.parquet")
            assert len(bloom_files) <= n_shards * (every + 1)
        assert fi._compactions == gens // every
        assert fi.count == bc.count
        # every URL was admitted across the 24 residues -> nothing unseen
        assert fi.filter_unseen(delta).count() == 0
        # and on a fresh candidate set both mechanisms agree row-for-row
        probe = delta.withColumn(
            "url", F.concat(F.col("url"), F.lit("?x"))
        ).withColumn("url_hash", F.xxhash64("url"))
        got_fi = sorted(r["url"] for r in fi.filter_unseen(probe).collect())
        got_bc = sorted(r["url"] for r in bc.filter_unseen(probe).collect())
        assert got_fi == got_bc
    finally:
        fi.drop()
        bc.drop()
