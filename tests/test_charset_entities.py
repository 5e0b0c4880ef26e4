"""Charset + HTML-entity breadth goldens (ROADMAP r1 §7): non-UTF8 input
bytes must decode deterministically (U+FFFD replacement, never a crash),
and both parsers must agree on entity handling."""

from eget_crawler_for_overflow_spark.functions.extract import (
    _decode,
    _extract_from_root,
    extract_page,
)
from eget_crawler_for_overflow_spark.functions.htmllib import (
    parse_html_fast,
    parse_html_stdlib,
)

ENTITY_CASES = [
    # named / decimal / hex refs + escapes
    "<html><body><main><p>caf&eacute; &#233; &#x00E9; A&amp;B &lt;tag&gt;"
    "</p></main></body></html>",
    # entities inside attribute values
    '<html><body><main><p title="a&quot;b &amp; c">x</p>'
    '<a href="/p?a=1&amp;b=2">L</a></main></body></html>',
    # malformed refs pass through / replace, never raise
    "<html><body><main><p>&unknown; &; &#999999999; &#xZZ;</p></main>"
    "</body></html>",
]


def test_parsers_agree_on_entities():
    for html in ENTITY_CASES:
        mf = _extract_from_root(parse_html_fast(html))["markdown"]
        ms = _extract_from_root(parse_html_stdlib(html))["markdown"]
        assert mf == ms, html


def test_entity_goldens():
    md = extract_page(ENTITY_CASES[0])["markdown"]
    assert md == "café é é A&B <tag>\n"
    md = extract_page(ENTITY_CASES[1])["markdown"]
    assert md == "x\n\n[L](/p?a=1&b=2)\n"


def test_latin1_bytes_replacement():
    b = "<html><body><main><p>café</p></main></body></html>".encode("latin-1")
    assert extract_page(_decode(b))["markdown"] == "caf�\n"


def test_cp1252_bytes_replacement():
    b = "<html><body><main><p>naïve — “quoted”</p></main></body></html>".encode(
        "cp1252"
    )
    md = extract_page(_decode(b))["markdown"]
    assert md == "na�ve � �quoted�\n"


def test_truncated_multibyte_no_crash():
    b = "<html><body><main><p>oké</p></main></body></html>".encode("utf-8")
    # chop mid-codepoint: the é becomes a replacement char, parse survives
    broken = b[: b.index(b"\xc3") + 1] + b[b.index(b"\xc3") + 2 :]
    md = extract_page(_decode(broken))["markdown"]
    assert "ok" in md and "</p>" not in md


def test_null_and_empty_bytes():
    assert extract_page(_decode(None))["markdown"] == ""
    assert extract_page(_decode(b""))["markdown"] == ""
    # tagless garbage is treated as text: NULs kept, invalid bytes replaced
    assert extract_page(_decode(b"\x00\xff\xfe"))["markdown"] == "\x00��\n"
