"""Converter registry plumbing + Structured Streaming extraction path."""

import pytest
from pyspark.sql import functions as F

from eget_crawler_for_overflow_spark.fixtures import load_pages
from eget_crawler_for_overflow_spark.functions.convert import (
    clean_text,
    convert_files,
    get_converter,
    read_binary_files,
    register_converter,
)
from eget_crawler_for_overflow_spark.streaming.stream_extract import (
    extract_stream,
    stream_pages,
    windowed_host_counts,
)

SF = "/root/testdata/sf0.001"


def test_registry_dispatch_and_stub(tmp_path):
    assert get_converter("txt")(b"hello   world") == "hello world"
    # the r4 stdlib PDF decoder fails loud on a text-less payload
    with pytest.raises(ValueError, match="no extractable text layer"):
        get_converter("pdf")(b"%PDF-1.4")
    with pytest.raises(ValueError):
        get_converter("exe")
    register_converter("rot13", lambda b: b.decode().swapcase())
    assert get_converter("rot13")(b"aB") == "Ab"


def test_clean_text_reference_semantics():
    """Byte-equality against base_converter.py:40-51's documented behavior:
    control chars (category C*, except \\n\\t) -> SPACE, whitespace runs
    collapse, lines strip()ed on BOTH ends."""
    assert clean_text("a\x00b\x07c") == "a b c"  # controls become spaces
    assert clean_text("a  \t b") == "a b"
    assert clean_text("a\n\n\n\n\nb") == "a\n\nb"
    assert clean_text("line   \nnext  ") == "line\nnext"
    assert clean_text("  lead\n\tindent x") == "lead\nindent x"  # lstrip too
    assert clean_text("a\rb") == "a b"  # \r is Cc -> space
    assert clean_text("a​b") == "a b"  # zero-width (Cf) -> space
    assert clean_text("caf\xe9 \xa0 x") == "caf\xe9 x"  # nbsp collapses


def test_clean_text_differential_vs_reference_formula():
    """Property check vs an inline replica of the reference's exact
    operation sequence (unicodedata category test per char)."""
    import random
    import re as _re
    import unicodedata as _ud

    def ref(text):
        if not text:
            return ""
        text = "".join(
            ch if ch in "\n\t" or not _ud.category(ch).startswith("C") else " "
            for ch in text
        )
        text = _re.sub(r"[^\S\n]+", " ", text)
        text = _re.sub(r"\n{3,}", "\n\n", text)
        return "\n".join(line.strip() for line in text.split("\n")).strip()

    rng = random.Random(7)
    pool = "ab c\t\n\r\x00\x07\x7f\xa0​ \xe9漢  \x1b"
    for _ in range(500):
        s = "".join(rng.choice(pool) for _ in range(rng.randrange(0, 40)))
        assert clean_text(s) == ref(s), repr(s)


def test_convert_files_pipeline(spark, tmp_path):
    (tmp_path / "ok.txt").write_text("some   text\n\n\n\nhere")
    (tmp_path / "doc.pdf").write_bytes(b"%PDF-fake")
    out = convert_files(read_binary_files(spark, str(tmp_path))).collect()
    by_type = {r["file_type"]: r for r in out}
    assert by_type["txt"]["markdown"] == "some text\n\nhere"
    assert by_type["txt"]["error"] is None
    assert by_type["pdf"]["markdown"] is None
    assert "ValueError" in by_type["pdf"]["error"]


def test_streaming_extraction_matches_batch(spark, tmp_path):
    pages = load_pages(spark, SF)
    src = str(tmp_path / "pages_stream")
    pages.limit(50).write.parquet(src)

    stream = extract_stream(stream_pages(spark, src))
    q = (
        stream.writeStream.format("memory")
        .queryName("ext_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT url, markdown FROM ext_stream")
    batch = pages.limit(50).select("url", F.col("text").alias("markdown"))
    assert got.count() == 50
    assert got.exceptAll(batch).count() == 0  # byte-identical to batch oracle


def test_streaming_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState seen-set: a url that already streamed through
    in an earlier micro-batch is never emitted again (first-wins across
    batches, state persisted via the streaming checkpoint)."""
    from eget_crawler_for_overflow_spark.streaming.stream_dedup import (
        dedup_stream,
    )

    pages = load_pages(spark, SF)
    src = str(tmp_path / "dedup_stream_src")
    # two overlapping files -> two micro-batches (maxFilesPerTrigger=1):
    # 0-39 then 20-59; urls 20-39 must be emitted exactly once
    first = pages.limit(40)
    both = pages.limit(60)
    second = both.exceptAll(first.limit(20))  # rows 20-59
    first.coalesce(1).write.mode("overwrite").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    out = dedup_stream(stream_pages(spark, src, max_files=1))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT url FROM dedup_out")
    assert got.count() == 60  # 80 input rows, 20 dups suppressed
    assert got.distinct().count() == 60


def test_streaming_windowed_counts(spark, tmp_path):
    pages = load_pages(spark, SF)
    src = str(tmp_path / "pages_stream2")
    pages.limit(100).write.parquet(src)
    counts = windowed_host_counts(extract_stream(stream_pages(spark, src)))
    q = (
        counts.writeStream.format("memory")
        .queryName("host_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM host_counts").collect()
    assert sum(r["n_pages"] for r in rows) == 100
    assert all(r["host"].startswith("host") for r in rows)
