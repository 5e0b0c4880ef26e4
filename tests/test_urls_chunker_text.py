"""URL normalization corner cases, pattern-filter Python-re semantics,
chunker branch coverage, md_clean bug-for-bug behavior."""

from eget_crawler_for_overflow_spark.functions.text import clean_markdown
from eget_crawler_for_overflow_spark.functions.urls import (
    extract_links,
    normalize_url,
)
from eget_crawler_for_overflow_spark.operators.chunker import (
    chunk_markdown,
    sentence_chunks,
)

BASE = "https://a.example/x/y"


def test_normalize_reference_semantics():
    # urljoin + strip fragment/params/query (link_extractor.py:48-67)
    assert normalize_url("b", BASE) == "https://a.example/x/b"
    assert normalize_url("/b", BASE) == "https://a.example/b"
    assert normalize_url("../b", BASE) == "https://a.example/b"
    assert normalize_url("#frag", BASE) == BASE
    assert normalize_url("?q=1", BASE) == BASE
    assert normalize_url("//other.example/z", BASE) == "https://other.example/z"
    assert normalize_url("https://b.example/p?x=1#y", BASE) == "https://b.example/p"
    assert normalize_url("mailto:a@b.c", BASE) == "mailto:a@b.c"
    assert normalize_url("javascript:void(0)", BASE) == "javascript:void(0)"


def test_extract_links_filters_and_order():
    html = (
        '<a href="/one">1</a><a href="#top">t</a><a href="https://b.example/z">x</a>'
        '<a href="/one#dup">d</a><a href="mailto:m@x.y">m</a><a href="/two">2</a>'
    )
    links = extract_links(html, "https://a.example/p")
    assert links == [
        "https://a.example/one",
        "https://a.example/p",
        "https://a.example/two",
    ]


def test_extract_links_patterns_python_re():
    import re

    html = '<a href="/Blog/A">a</a><a href="/blog/b">b</a><a href="/api/c">c</a>'
    links = extract_links(
        html,
        "https://a.example/",
        exclude=[re.compile(r"/api/")],
        include=[re.compile(r"(?i)/blog/")],  # inline flag: Python-re-only
    )
    assert links == ["https://a.example/Blog/A", "https://a.example/blog/b"]


# ---------------------------------------------------------------------------
# chunker (reference semantic_chunker.py quirks)
# ---------------------------------------------------------------------------


def test_chunker_preamble_only_emitted_when_header_found():
    # preamble becomes a chunk when a header follows (:90-96)
    md = "intro text\nmore intro\n\n# H\n\nbody here\n"
    chunks = chunk_markdown(md)
    assert chunks[0]["content"] == "intro text\nmore intro"
    assert [c["position"] for c in chunks] == list(range(len(chunks)))
    # without any header, everything stays preamble and nothing is emitted
    assert chunk_markdown("no headers at all\njust text\n") == []


def test_chunker_blank_lines_do_not_flush():
    # blank-line elif is dead code (:101-110): paragraphs coalesce
    md = "# H\n\npara one\n\npara two\n"
    chunks = chunk_markdown(md)
    assert len(chunks) == 1
    assert chunks[0]["content"] == "para one\n\npara two"


def test_chunker_code_fence_swallows_pending_content():
    md = "# H\n\nlead\n\n```js\nlet x;\n```\n"
    chunks = chunk_markdown(md)
    assert len(chunks) == 1
    c = chunks[0]
    assert c["type"] == "code"
    assert c["code_language"] == "js"
    assert c["content"] == "lead\n\n```js\nlet x;\n```"


def test_chunker_type_heuristics_and_flags():
    md = "# H\n\n- a\n- b\n"
    assert chunk_markdown(md)[0]["type"] == "list"
    md = "# H\n\n| a | b |\n|---|---|\n| 1 | 2 |\n"
    assert chunk_markdown(md)[0]["type"] == "table"
    md = "# H\n\n" + "w " * 1501 + "\n"
    c = chunk_markdown(md)[0]
    assert c["needs_split"] and not c["needs_merge"]
    md = "# H\n\nshort\n"
    c = chunk_markdown(md)[0]
    assert c["needs_merge"] and not c["needs_split"]


def test_sentence_chunker_packs_and_overlaps():
    text = " ".join(f"Sentence number {i} is here." for i in range(200))
    chunks = sentence_chunks(text, chunk_size=50, overlap=5)
    assert len(chunks) > 1
    assert all(c["token_count"] <= 60 for c in chunks)
    assert [c["position"] for c in chunks] == list(range(len(chunks)))


# ---------------------------------------------------------------------------
# md_clean (chunk_service.py:27-64, bug-for-bug)
# ---------------------------------------------------------------------------


def test_md_clean_reference_chain():
    # \s+ collapse destroys newlines BEFORE the newline fixes (SURVEY §2.3)
    assert clean_markdown("a\n\n\n\nb") == "a b"
    assert clean_markdown("##Header") == "## Header"
    assert clean_markdown("x <!-- hidden --> y") == "x  y"
    assert clean_markdown("a&nbsp;b\xa0c") == "a b c"
    assert clean_markdown("line   \t end") == "line end"


def test_lang_id_top20_matrix(spark):
    """lang_id over the widened 20-language stopword matrix: each language
    detected from a sentence of its own function words; tie-break by
    language-code order; no markers -> 'und'."""
    from pyspark.sql import functions as F

    from eget_crawler_for_overflow_spark.functions.text import (
        LANG_MARKERS,
        lang_id,
    )

    assert len(LANG_MARKERS) == 20
    rows = [(lang, " ".join(ms)) for lang, ms in LANG_MARKERS.items()]
    rows.append(("und", "zzz qqq xxx"))
    df = spark.createDataFrame(rows, "expected string, text string")
    got = {
        r["expected"]: r["pred"]
        for r in df.select(
            "expected", lang_id(F.col("text")).alias("pred")
        ).collect()
    }
    assert got["und"] == "und"
    assert got["en"] == "en" and got["ru"] == "ru" and got["zh"] == "zh"

    # true differential: replicate the scoring contract in Python
    # (marker-token count per language, argmax, alphabetical tie-break,
    # all-zero -> 'und') and require the engine to match it EXACTLY for
    # every language's own marker sentence — overlapping stopword sets
    # (da/no/sv, ru/uk) tie-break deterministically, not arbitrarily
    def expected_pred(text):
        toks = text.lower().split()
        scores = {
            lang: sum(toks.count(m) for m in ms)
            for lang, ms in LANG_MARKERS.items()
        }
        best = max(sorted(scores), key=lambda lg: scores[lg])
        return best if scores[best] > 0 else "und"

    for lang, ms in LANG_MARKERS.items():
        assert got[lang] == expected_pred(" ".join(ms)), (lang, got[lang])


def test_lang_id_zh_ja_unsegmented(spark):
    """zh/ja character-bigram path (VERDICT r3 item 8): UNSEGMENTED text in
    non-space-delimited scripts must fire (the whitespace-token matrix
    never can), and the engine must match the DuckDB oracle — both sides
    generated from the same single-sourced marker matrices."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from eget_crawler_for_overflow_spark.functions.text import lang_id
    from eget_crawler_for_overflow_spark.oracles import ORACLES

    rows = [
        (0, "これはテストです。日本語の文章ですが、単語の区切りはありません。そして続きます。"),
        (1, "我们今天去公园，这个地方没有什么人，他们自己可以决定。"),
        (2, "the quick brown fox and the lazy dog is in the yard"),
        (3, "zzz qqq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["lang_pred"]
        for r in df.select(
            "doc_id", lang_id(F.col("text")).alias("lang_pred")
        ).collect()
    }
    assert got[0] == "ja" and got[1] == "zh"
    assert got[2] == "en" and got[3] == "und"
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = dict(con.execute(ORACLES["lang_id"]).fetchall())
    assert got == want


def test_lang_id_short_text_and_mixed_script(spark):
    """VERDICT r4 item 8: short real-world zh/ja texts (titles, tweets)
    must score >0 via the single-char function markers, and kanji shared
    between the scripts must not flip Japanese text to zh (kana markers
    dominate). Engine stays value-exact vs the generated oracle."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from eget_crawler_for_overflow_spark.functions.text import lang_id
    from eget_crawler_for_overflow_spark.oracles import ORACLES

    rows = [
        (0, "日本語のページ"),                      # ja title: particle の only
        (1, "今天的天气"),                          # zh title: particle 的 only
        (2, "自己の目的を持つことが大事です"),      # ja with zh-marker kanji 自己/的
        (3, "他们在公园里"),                        # zh tweet-length
        (4, "猫"),                                  # single CJK char, no marker
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["lang_pred"]
        for r in df.select(
            "doc_id", lang_id(F.col("text")).alias("lang_pred")
        ).collect()
    }
    assert got[0] == "ja" and got[1] == "zh"
    assert got[2] == "ja"  # mixed-script tie-break: kana beat stray kanji
    assert got[3] == "zh" and got[4] == "und"
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = dict(con.execute(ORACLES["lang_id"]).fetchall())
    assert got == want
