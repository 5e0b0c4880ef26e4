"""Fast tokenizer ⇔ stdlib html.parser equivalence: the extraction bundle
and link sets must be identical through either parser on corpus pages and
on adversarial fragments."""

import duckdb
import pytest

from eget_crawler_for_overflow_spark import pagemodel as pm
from eget_crawler_for_overflow_spark.functions import extract as E
from eget_crawler_for_overflow_spark.functions.htmllib import (
    parse_html_fast,
    parse_html_stdlib,
)
from eget_crawler_for_overflow_spark.functions.urls import extract_links_from_root

EDGES = [
    "",
    "<",
    "plain text only",
    "<p>unclosed",
    "<<<>>>",
    "<div><p>a<p>b</div>",
    '<a href="x>y">t</a>',  # '>' inside quoted attr
    "<script>if(a<b){x();}</script><p>after</p>",  # raw-text with '<'
    "<p>a &amp; b &lt;c&gt;</p>",  # entities in data
    '<META NAME="language" CONTENT="fr">',  # case folding
    "<ul><li>one<li>two</ul>",  # implicit </li>
    "<!DOCTYPE html><html><body><main>x</main>",
    "<img src=a.png alt=pic>",  # unquoted attrs
    "<style>p>q{color:red}</style><p>vis</p>",
    "<p>text <!-- hidden <p>fake --> tail</p>",
    "<table><tr><th>h</th></tr><tr><td>1</td></tr></table>",
    '<a href="/x" href="/y">dup attr</a>',
    "<br/><hr/><p>selfclose</p>",
]


def _both(html: str):
    return (
        E._extract_from_root(parse_html_fast(html)),
        E._extract_from_root(parse_html_stdlib(html)),
    )


@pytest.mark.parametrize("html", EDGES)
def test_edge_fragments_equivalent(html):
    fast, slow = _both(html)
    assert fast == slow


def test_corpus_sample_equivalent():
    docs = duckdb.sql(
        "SELECT text, lang FROM '/root/testdata/sf0.01/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    for i in range(0, 5000, 11):
        t, lg = docs[i % 500]
        h = pm.page_html(i, t, lg, 5000, 64)
        url = pm.url_of(i, 64)
        assert E._extract_from_root(parse_html_fast(h)) == E._extract_from_root(
            parse_html_stdlib(h)
        ), i
        assert extract_links_from_root(
            parse_html_fast(h), url
        ) == extract_links_from_root(parse_html_stdlib(h), url), i
