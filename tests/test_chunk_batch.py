"""Batch /chunk envelope (operators/chunk_batch.py): per-row chunker
dispatch, the two-layer knob defaulting, the ChunkResponse envelope, the
failed-scrape error path, and the join plan shape.

Reference: api/v1/endpoints/chunker.py:9-10 (endpoint),
models/chunk_request.py:5-14 (pydantic defaults),
services/chunker/chunk_service.py:66-215 (service pipeline + stats),
:81-88 (failure envelope), :97-106 / :148-152 (`or` fallbacks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_crawler_for_overflow_spark.operators.chunk_batch import (
    OPTION_COLUMNS,
    chunk_batch,
    chunk_response,
    chunk_response_rows,
)

_WORDS = " ".join(f"w{i}" for i in range(150))
# one-line doc with a mid-line header marker after cleaning -> exactly one
# semantic chunk of ~154 words (chunk_batch.py module docstring)
_HTML_HDR = f"<p>Intro here.</p><h2>Sec</h2><p>{_WORDS}.</p>".encode()
_HTML_PLAIN = b"<p>alpha one. beta two three. gamma four five six seven.</p>"


def test_two_layer_knob_defaults_semantic():
    """Omitted field -> pydantic default (128/512); explicit null ->
    service `or` fallback (200/1500). A 154-word chunk sits between the
    two min defaults, so the layers are observably different."""
    pyd_min = OPTION_COLUMNS["min_chunk_size"][1]  # 128
    pyd_max = OPTION_COLUMNS["max_chunk_size"][1]  # 512
    r_default = chunk_response(_HTML_HDR, "semantic", pyd_max, pyd_min, 0)
    r_null = chunk_response(_HTML_HDR, "semantic", None, None, None)
    assert r_default["total_chunks"] == r_null["total_chunks"] == 1
    wc = r_default["chunks"][0]["word_count"]
    assert 128 <= wc < 200
    assert r_default["chunks"][0]["needs_merge"] is False  # min 128
    assert r_null["chunks"][0]["needs_merge"] is True  # min -> 200


def test_sentence_zero_overlap_becomes_50():
    """chunk_overlap=0 trips the service's `or 50` (chunk_service.py:103):
    identical output to an explicit 50, different from a real overlap of 1
    (five 3-token sentences, size 9: overlap 50 slides the window back two
    units per chunk; overlap 1 admits no suffix at all)."""
    html = (
        "<p>"
        + " ".join(f"alpha{i} beta{i} s{i}." for i in range(5))
        + "</p>"
    ).encode()
    z = chunk_response(html, "sentence", 9, None, 0)
    fifty = chunk_response(html, "sentence", 9, None, 50)
    one = chunk_response(html, "sentence", 9, None, 1)
    assert [c["content"] for c in z["chunks"]] == [
        c["content"] for c in fifty["chunks"]
    ]
    assert [c["content"] for c in z["chunks"]] != [
        c["content"] for c in one["chunks"]
    ]
    # null size -> 512 (`or 512`, :101): whole doc in one chunk
    whole = chunk_response(_HTML_PLAIN, "sentence", None, None, None)
    assert whole["total_chunks"] == 1


def test_bogus_chunker_type_dispatches_semantic_stats_echo_raw():
    """Any non-'sentence' string selects the semantic chunker while the
    stats echo the raw value (chunk_service.py:97,207)."""
    bogus = chunk_response(_HTML_HDR, "bogus", None, None, None)
    sem = chunk_response(_HTML_HDR, "semantic", None, None, None)
    assert bogus["chunker_type"] == "bogus"
    assert [c["content"] for c in bogus["chunks"]] == [
        c["content"] for c in sem["chunks"]
    ]
    # None -> 'semantic' via the same `or`
    assert chunk_response(_HTML_HDR, None, None, None, None)["chunker_type"] == (
        "semantic"
    )


def test_semantic_one_line_degeneracy():
    """The cleaned one-line document yields zero semantic chunks when it
    starts with (or lacks) a header marker, one whole-line chunk when a
    marker sits mid-line — success=true in every case."""
    no_hdr = chunk_response(_HTML_PLAIN, "semantic", None, None, None)
    assert no_hdr["success"] and no_hdr["total_chunks"] == 0
    assert no_hdr["avg_chunk_size"] == 0.0
    lead_hdr = chunk_response(
        b"<h1>Top</h1><p>tail words here.</p>", "semantic", None, None, None
    )
    assert lead_hdr["success"] and lead_hdr["total_chunks"] == 0
    mid_hdr = chunk_response(_HTML_HDR, "semantic", None, None, None)
    assert mid_hdr["total_chunks"] == 1
    assert mid_hdr["chunks"][0]["content"] == mid_hdr["markdown"]
    assert "## Sec" in mid_hdr["markdown"]


def test_spark_batch_hits_misses_and_defaults(spark):
    """Engine path: defaults applied for absent option columns, per-row
    dispatch, and the reference failure envelope for corpus misses."""
    pages = spark.createDataFrame(
        [("https://a.example/1", bytearray(_HTML_PLAIN))], "url string, html binary"
    )
    req = spark.createDataFrame(
        [
            ("https://a.example/1", "sentence", 4),
            ("https://a.example/1", "semantic", None),
            ("https://gone.example/x", "sentence", None),
        ],
        "url string, chunker_type string, max_chunk_size int",
    )
    rows = chunk_response_rows(chunk_batch(req, pages)).collect()
    miss = [r for r in rows if r.url.startswith("https://gone")]
    assert len(miss) == 1
    assert miss[0].success is False
    assert miss[0].error == "Failed to scrape URL"
    assert miss[0].chunker_type is None
    assert miss[0].total_chunks == 0 and miss[0].markdown == ""
    sent = [r for r in rows if r.chunker_type == "sentence"]
    assert len(sent) >= 2 and all(r.success for r in sent)
    # absent chunk_overlap column -> pydantic 0 -> service 50
    py = chunk_response(_HTML_PLAIN, "sentence", 4, None, 0)
    assert sorted(r.content for r in sent) == sorted(
        c["content"] for c in py["chunks"]
    )
    sem = [r for r in rows if r.chunker_type == "semantic"]
    assert len(sem) == 1 and sem[0].total_chunks == 0 and sem[0].position is None


def test_requests_broadcast_pages_never_shuffled(spark, sf001):
    """Same J3 plan shape as scrape_batch: requests broadcast, pages
    scanned without an Exchange."""
    from eget_crawler_for_overflow_spark.fixtures import load_pages
    from eget_crawler_for_overflow_spark.plans.explain import plan_text

    pages = load_pages(spark, sf001)
    out = chunk_batch(pages.select("url").limit(20), pages)
    plan = plan_text(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_chunk_batch_bucketed_pages_no_exchange(spark, sf001):
    """100 TB shape for huge request sets: broadcast_requests=False over a
    url-bucketed pages table must read pages straight from its buckets —
    exactly one Exchange (the requests side), never a pages shuffle (the
    same storage-partitioned shape as the crawl fetch and scrape_batch)."""
    import re as _re

    from eget_crawler_for_overflow_spark.fixtures import load_pages
    from eget_crawler_for_overflow_spark.plans.explain import plan_text

    pages = load_pages(spark, sf001)
    tbl = "pages_bucketed_chunk_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        pages.select("url", "html")
        .repartition(8, F.col("url"))
        .write.bucketBy(8, "url")
        .sortBy("url")
        .mode("overwrite")
        .saveAsTable(tbl)
    )
    req = spark.range(100).select(
        F.concat(F.lit("https://host0.example/p/"), F.col("id")).alias("url"),
        F.lit("sentence").alias("chunker_type"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = chunk_batch(req, spark.table(tbl), broadcast_requests=False)
        txt = plan_text(out)
        assert "Bucketed: true" in txt, txt
        shuffles = _re.findall(r"\(\d+\) Exchange\b", txt)
        assert len(shuffles) == 1, txt
        rows = out.collect()
        ok = [r for r in rows if r.success]
        assert ok and all(r.total_chunks >= 1 for r in ok)
        assert any(r.error == "Failed to scrape URL" for r in rows if not r.success)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_chunk_response_never_raises_on_hostile_inputs():
    """Driver-side fuzz of the per-row worker: arbitrary tag soup, raw
    binary, and hostile knob values must produce a success or error
    envelope — a raise would kill a whole Arrow batch (the reference's
    per-request try/except is chunk_service.py:68/210)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payload = st.one_of(
        st.binary(max_size=400),
        st.text(max_size=400).map(lambda s: s.encode("utf-8", "ignore")),
        st.none(),
    )
    knob = st.one_of(st.none(), st.integers(min_value=-5, max_value=2000))
    ctype = st.one_of(
        st.none(), st.sampled_from(["semantic", "sentence", "", "ZZZ"])
    )

    @settings(max_examples=200, deadline=None)
    @given(payload, ctype, knob, knob, knob)
    def run(html, ct, mx, mn, ov):
        r = chunk_response(html, ct, mx, mn, ov)
        assert r["success"] in (True, False)
        if r["success"]:
            assert r["total_chunks"] == len(r["chunks"])
            assert r["error"] is None
        else:
            assert r["error"] == "Failed to scrape URL"
        for c in r["chunks"]:
            assert c["content"] and c["word_count"] >= 1

    run()


def test_website_chunks_record_mapping(spark):
    """WebsiteChunk flattening mirrors the cookbook producer loop
    (kafka_utils.py:231-247): 1-based chunk_number, total_chunks echoed
    per record, content_type == chunk type, and failed/zero-chunk
    responses emit nothing."""
    pages = spark.createDataFrame(
        [("https://a.example/1", bytearray(_HTML_PLAIN))], "url string, html binary"
    )
    req = spark.createDataFrame(
        [
            ("https://a.example/1", "sentence", 4),
            ("https://a.example/1", "semantic", None),  # 0 chunks -> dropped
            ("https://gone.example/x", "sentence", None),  # miss -> dropped
        ],
        "url string, chunker_type string, max_chunk_size int",
    )
    from eget_crawler_for_overflow_spark.operators.chunk_batch import (
        website_chunks,
    )

    recs = website_chunks(chunk_batch(req, pages)).collect()
    assert recs and all(r.url == "https://a.example/1" for r in recs)
    n = recs[0].total_chunks
    assert len(recs) == n
    assert sorted(r.chunk_number for r in recs) == list(range(1, n + 1))
    for r in recs:
        assert r.chunk_id == f"{r.url}#{r.position}"
        assert r.chunk_number == r.position + 1
        assert r.content_type == r.chunk_type == "text"
        assert r.word_count >= 1 and r.chunk_content
        assert r.timestamp == ""


def test_streaming_chunk_feed_matches_batch(spark, sf001, tmp_path):
    """The cookbook RAG feed as one streaming query: pages stream →
    chunk_response_udf → WebsiteChunk records, identical to the batch
    operator over the same pages (stream_chunks.py)."""
    from eget_crawler_for_overflow_spark.fixtures import load_pages
    from eget_crawler_for_overflow_spark.streaming.stream_chunks import (
        COOKBOOK_KNOBS,
        chunk_stream,
    )
    from eget_crawler_for_overflow_spark.streaming.stream_extract import (
        stream_pages,
    )
    from eget_crawler_for_overflow_spark.operators.chunk_batch import (
        website_chunks,
    )

    pages = load_pages(spark, sf001)
    src = str(tmp_path / "chunk_stream_src")
    pages.limit(40).write.parquet(src)

    q = (
        chunk_stream(stream_pages(spark, src))
        .writeStream.format("memory")
        .queryName("chunk_feed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM chunk_feed")

    req = pages.limit(40).select(
        "url",
        *[F.lit(v).alias(k) for k, v in COOKBOOK_KNOBS.items()],
    )
    batch = website_chunks(chunk_batch(req, pages.limit(40)))
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0
