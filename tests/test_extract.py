"""Extraction semantics: byte-identical markdown on the synthetic corpus +
branch coverage of the reference's extraction rules (no Spark needed —
these run the pure functions the UDFs wrap)."""

import duckdb
import pytest

from eget_crawler_for_overflow_spark import pagemodel as pm
from eget_crawler_for_overflow_spark.functions.extract import (
    extract_language,
    extract_metadata,
    extract_page,
    extract_structured,
    find_main_content,
    to_markdown,
)
from eget_crawler_for_overflow_spark.functions.htmllib import parse_html

N_PAGES, N_HOSTS = 5000, 64


@pytest.fixture(scope="module")
def docs():
    return duckdb.sql(
        "SELECT doc_id, text, lang FROM "
        "'/root/testdata/sf0.01/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def test_byte_identical_markdown_all_variants(docs):
    """Every page of the t2 corpus: markdown, language, title, json-ld."""
    for i in range(0, N_PAGES, 3):
        t, lg = docs[i % 500][1], docs[i % 500][2]
        html = pm.page_html(i, t, lg, N_PAGES, N_HOSTS)
        r = extract_page(html)
        assert r["markdown"] == pm.expected_markdown(i, t, N_PAGES, N_HOSTS), i
        assert r["language"] == pm.expected_lang(i, lg), i
        assert r["title"] == pm.expected_title(i), i


def test_main_content_pattern_order():
    # main beats article beats div#content... (scraper.py:155-175)
    html = "<html><body><article>A</article><main>M</main></body></html>"
    assert find_main_content(parse_html(html)).get_text() == "M"
    html = '<html><body><div id="main-x">D</div><article>A</article></body></html>'
    assert find_main_content(parse_html(html)).get_text() == "A"
    html = '<html><body><div id="content-1">X</div><div class="main">Y</div></body></html>'
    assert find_main_content(parse_html(html)).get_text() == "X"
    html = '<html><body><div role="main">R</div><div>zzzzzzzzzzzz</div></body></html>'
    assert find_main_content(parse_html(html)).get_text() == "R"
    # fallback: largest text container among div/section
    html = "<html><body><div>ab</div><section>abcdefghij</section></body></html>"
    assert find_main_content(parse_html(html)).get_text() == "abcdefghij"


def test_clean_removes_reference_tag_set():
    html = (
        "<html><body><main><p>keep</p><script>no</script><style>no</style>"
        "<iframe>no</iframe><nav>no</nav><footer>no</footer>"
        "<noscript>no</noscript></main></body></html>"
    )
    assert extract_page(html)["markdown"] == "keep\n"


def test_metadata_og_title_beats_title():
    html = (
        '<html><head><meta property="og:title" content="OG"><title>T</title>'
        "</head><body><main>x</main></body></html>"
    )
    assert extract_metadata(parse_html(html))["title"] == "OG"
    html = "<html><head><title>T</title></head><body></body></html>"
    assert extract_metadata(parse_html(html))["title"] == "T"


def test_language_fallback_chain():
    # html@lang splits on '-' (structured_data.py:17)
    assert extract_language(parse_html('<html lang="en-US"></html>')) == "en"
    # http-equiv then name then og:locale, splitting on '_' (:21-33)
    assert (
        extract_language(
            parse_html(
                '<html><head><meta http-equiv="content-language" content="de"></head></html>'
            )
        )
        == "de"
    )
    assert (
        extract_language(
            parse_html('<html><head><meta name="language" content="fr"></head></html>')
        )
        == "fr"
    )
    assert (
        extract_language(
            parse_html(
                '<html><head><meta property="og:locale" content="es_MX"></head></html>'
            )
        )
        == "es"
    )
    assert extract_language(parse_html("<html></html>")) == ""


def test_structured_data_invalid_jsonld_skipped():
    html = (
        '<html><head><script type="application/ld+json">{bad</script>'
        '<script type="application/ld+json">{"a": 1}</script></head></html>'
    )
    s = extract_structured(parse_html(html))
    assert s["jsonLd"] == ['{"a":1}']
    assert s["metaData"]["language"] == ""


def test_markdown_dialect_blocks():
    html = (
        "<div><h3>H</h3><p>a <strong>b</strong> <em>c</em> <code>d</code></p>"
        "<ol><li>one</li><li>two</li></ol>"
        '<p><img alt="alt" src="s.png"> and <a href="u">t</a></p></div>'
    )
    md = to_markdown(parse_html(html))
    assert md == (
        "### H\n\na **b** *c* `d`\n\n1. one\n2. two\n\n![alt](s.png) and [t](u)\n"
    )


def test_broken_html_degrades_not_raises():
    assert extract_page("<div><p>unclosed")["markdown"] == "unclosed\n"
    assert extract_page("")["markdown"] == ""
    assert extract_page("<<<>>>")["title"] == ""
