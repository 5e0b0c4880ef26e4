"""Property-based fuzz: the fast tokenizer must agree with stdlib
html.parser on the extraction surface for arbitrary tag soup."""

from hypothesis import given, settings
from hypothesis import strategies as st

from eget_crawler_for_overflow_spark.functions import extract as E
from eget_crawler_for_overflow_spark.functions.htmllib import (
    parse_html_fast,
    parse_html_stdlib,
)

TAGS = ["div", "p", "a", "main", "article", "span", "ul", "li", "h1", "h2",
        "pre", "code", "table", "tr", "td", "meta", "script", "nav", "em"]
WORDS = ["alpha", "beta", "gamma", "x", "1", "&amp;", "a b", "<", ">"]

piece = st.one_of(
    st.sampled_from(WORDS),
    st.sampled_from(TAGS).map(lambda t: f"<{t}>"),
    st.sampled_from(TAGS).map(lambda t: f"</{t}>"),
    st.sampled_from(TAGS).map(lambda t: f'<{t} id="i1" class="c-{t}">'),
    st.sampled_from(TAGS).map(
        lambda t: f'<{t} href="/p/{t}" content="v" name="n">'
    ),
    st.just("<!-- comment -->"),
    st.just("<!DOCTYPE html>"),
    st.just("<br/>"),
)

soup = st.lists(piece, min_size=0, max_size=40).map("".join)


@settings(max_examples=300, deadline=None)
@given(soup)
def test_fast_parser_matches_stdlib_on_tag_soup(html):
    fast = E._extract_from_root(parse_html_fast(html))
    slow = E._extract_from_root(parse_html_stdlib(html))
    assert fast == slow
