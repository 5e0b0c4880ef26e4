"""Edge cases of the pinned sentence-chunker contract (C2) and the
scrape-options extraction surface."""

from eget_crawler_for_overflow_spark import pagemodel as pm
from eget_crawler_for_overflow_spark.functions.extract import extract_page
from eget_crawler_for_overflow_spark.operators.chunker import sentence_chunks


def toks(s):
    return len(s.split())


def test_empty_and_whitespace():
    assert sentence_chunks("") == []
    assert sentence_chunks(None) == []
    assert sentence_chunks("   ") == []


def test_single_sentence_over_chunk_size():
    # one unit larger than chunk_size still becomes one chunk (>=1 unit)
    text = " ".join(f"word{i}" for i in range(40)) + "."
    out = sentence_chunks(text, chunk_size=10, overlap=3)
    assert len(out) == 1
    assert out[0]["token_count"] == 40


def test_min_chars_merge_forward():
    # "Hi. Ok." pieces are under 12 chars -> merge forward until >= 12
    out = sentence_chunks("Hi. Ok. Now a longer sentence follows here.", chunk_size=100, overlap=0)
    assert len(out) == 1
    # the short pieces merged; total tokens preserved
    assert out[0]["token_count"] == toks("Hi. Ok. Now a longer sentence follows here.")


def test_trailing_short_unit_stands_alone():
    out = sentence_chunks("A reasonably long first sentence here. Bye.", chunk_size=5, overlap=0)
    # first unit (6 tokens) overflows chunk_size alone; "Bye." (4 chars
    # < 12) is trailing -> own unit -> second chunk
    assert len(out) == 2
    assert out[1]["content"] == "Bye."


def test_overlap_progress_guarantee():
    # overlap >= chunk tokens must still advance (never repeat a chunk)
    text = " ".join(f"sentence number {i} is right here." for i in range(30))
    out = sentence_chunks(text, chunk_size=12, overlap=1000)
    positions = [c["position"] for c in out]
    assert positions == list(range(len(out)))
    # every input token appears; chunks advance through the text
    assert out[-1]["content"].endswith("here.")


def test_overlap_tokens_bounded():
    text = " ".join(f"sentence number {i} is right here." for i in range(30))
    out = sentence_chunks(text, chunk_size=18, overlap=6)
    # consecutive chunks share exactly the sentence-suffix <= 6 tokens
    for a, b in zip(out, out[1:]):
        a_sents = a["content"].split(". ")
        b_sents = b["content"].split(". ")
        shared = [s for s in a_sents if s in b_sents]
        assert toks(". ".join(shared)) <= 6 + 1  # '.' splitting slack


# ---- scrape options ---------------------------------------------------


def _html(i=3):
    return pm.page_html(i, "DOCTEXT body words here", "en", 500, 8)


def test_include_tags_topmost_only():
    md = extract_page(_html(), include_tags=["h1", "h2"])["markdown"]
    assert md == "# Doc 3\n\n## Details\n"


def test_exclude_tags_removes_blocks():
    md_full = extract_page(_html(0))["markdown"]  # i=0 has a ```python block
    md_ex = extract_page(_html(0), exclude_tags=["pre"])["markdown"]
    assert "```python" in md_full and "```python" not in md_ex


def test_only_main_false_keeps_link_farm_block():
    md = extract_page(_html(), only_main=False)["markdown"]
    assert "[top](#top)" in md and "[mail](mailto:x@example.com)" in md
    # cleaned elements stay out even in whole-soup mode
    assert "site nav" not in md and "(c) example" not in md


def test_unknown_include_tag_yields_empty():
    md = extract_page(_html(), include_tags=["video"])["markdown"]
    assert md == ""
