"""Semantic markdown chunker — the engine's UDTF-shaped operator
(1 page → N chunks), as a pandas UDF returning ``array<struct>`` +
``posexplode`` (SURVEY.md §2.8 C1).

Bug-for-bug reimplementation of the reference
(/root/reference/services/chunker/semantic_chunker.py:25-238), including
its quirks — they are the observable semantics:

* the "Rest of the header handling code..." placeholder (:99) means header
  lines themselves are DROPPED and no ``Header i`` metadata is ever
  recorded, so ``path``/``level`` are always empty/0 and ``heading`` None;
* blank lines flush the current content into a chunk (:101-110);
* code fences emit a dedicated code chunk at the closing fence (:51-71);
* preamble before the first header becomes a chunk only when a header is
  eventually found and no chunk precedes it (:90-96);
* type heuristics on content prefix, with the reference's exact
  ``'-|-' in content`` table test (:189-197);
* size flags: <200 words → needs_merge, >1500 → needs_split (:166-175);
* word_count = ``len(content.split())`` (:161).

Deterministic ids (``url#position``) replace the reference's uuid4
(SURVEY.md §1.2). The markdown-cleaning pre-pass (chunk_service.py:27-64)
lives in functions/text.py and is applied by the caller when wanted.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HEADER_SEPS = ["#", "##", "###", "####", "#####", "######"]
_MIN_WORDS = 200
_MAX_WORDS = 1500
_LIST_RE = re.compile(r"^\s*[-*]\s", re.MULTILINE)


def _create_chunk(
    content: str,
    chunk_type: str = "text",
    code_language: str | None = None,
    min_words: int = _MIN_WORDS,
    max_words: int = _MAX_WORDS,
) -> dict | None:
    if not content:
        return None
    content = "\n".join(line.rstrip() for line in content.splitlines()).strip()
    if not content:
        return None
    lines = content.splitlines()
    word_count = len(content.split())
    is_code = chunk_type == "code"
    needs_merge = False
    needs_split = False
    if not is_code:  # header/preamble chunks never occur (placeholder bug)
        if word_count < min_words:
            needs_merge = True
        elif word_count > max_words:
            needs_split = True
    if chunk_type == "text":
        if content.startswith("#"):
            chunk_type = "header"
        elif content.startswith("```"):
            chunk_type = "code"
        elif (
            content.startswith("- ")
            or content.startswith("* ")
            or content.startswith("1. ")
        ):
            chunk_type = "list"
        elif "|" in content and "-|-" in content:
            chunk_type = "table"
    return {
        "content": content,
        "type": chunk_type,
        "code_language": code_language if is_code else None,
        "word_count": word_count,
        "line_count": len(lines),
        "level": 0,  # header metadata never recorded (reference :99)
        "path": [],
        "heading": None,
        "needs_merge": needs_merge,
        "needs_split": needs_split,
        "has_code": "```" in content or "`" in content,
        "has_lists": bool(_LIST_RE.search(content)),
        "has_links": "[" in content and "](" in content,
        "position": 0,
    }


def chunk_markdown(
    text: str,
    min_words: int = _MIN_WORDS,
    max_words: int = _MAX_WORDS,
) -> list[dict]:
    """``min_words``/``max_words`` mirror the per-request
    ``SemanticChunker(max_chunk_size, min_chunk_size)`` knobs
    (chunk_service.py:148-152); defaults keep the module-constant
    behavior every existing caller pins."""
    if text is None:
        return []
    chunks: list[dict] = []
    current: list[str] = []
    preamble: list[str] = []
    found_first_header = False
    in_code = False
    code_language: str | None = None

    def emit(content: str, ctype: str = "text", lang: str | None = None) -> None:
        c = _create_chunk(content, ctype, lang, min_words, max_words)
        if c is not None:
            chunks.append(c)

    for line in text.split("\n"):
        stripped = line.strip()

        # "sep + ' ' in stripped" for any of "#"…"######" is equivalent to
        # the single test '"# " in stripped' ("# " is a substring of every
        # longer marker) — one contains-scan instead of six string builds
        # per line (r7; behavior-identical, golden suite unchanged)
        if not found_first_header and "# " not in stripped:
            preamble.append(line)
            continue

        if not in_code and stripped.startswith("```"):
            in_code = True
            code_language = stripped[3:].strip()
            current.append(line)
            continue
        elif in_code:
            current.append(line)
            if stripped.startswith("```"):
                in_code = False
                if current:
                    emit("\n".join(current), "code", code_language)
                    current = []
            continue

        header_match = False
        # every marker starts with '#': one cheap guard skips the 6-way
        # startswith loop on ordinary lines (at most one sep can match)
        for sep in _HEADER_SEPS if stripped.startswith("#") else ():
            if stripped.startswith(sep + " "):
                found_first_header = True
                header_match = True
                if current:
                    emit("\n".join(current))
                    current = []
                elif preamble and not chunks:
                    emit("\n".join(preamble))
                    preamble = []
                # reference :99 — header line itself is dropped

        if not header_match and not in_code:
            if line.strip() or current:
                current.append(line)
            elif current:
                emit("\n".join(current))
                current = []

    if current:
        emit("\n".join(current))

    for i, c in enumerate(chunks):
        c["position"] = i
    return chunks


CHUNK_STRUCT = T.StructType(
    [
        T.StructField("content", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("code_language", T.StringType()),
        T.StructField("word_count", T.IntegerType()),
        T.StructField("line_count", T.IntegerType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("path", T.ArrayType(T.StringType())),
        T.StructField("heading", T.StringType()),
        T.StructField("needs_merge", T.BooleanType()),
        T.StructField("needs_split", T.BooleanType()),
        T.StructField("has_code", T.BooleanType()),
        T.StructField("has_lists", T.BooleanType()),
        T.StructField("has_links", T.BooleanType()),
        T.StructField("position", T.IntegerType()),
    ]
)


@F.pandas_udf(T.ArrayType(CHUNK_STRUCT))
def chunk_markdown_udf(md: pd.Series) -> pd.Series:
    return pd.Series([chunk_markdown(m) for m in md])


def chunks_table(df, md_col: str = "markdown", url_col: str = "url"):
    """(url, markdown) → exploded chunks with deterministic ids
    (``url#position`` replaces uuid4, SURVEY.md §1.2)."""
    exploded = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(chunk_markdown_udf(F.col(md_col))).alias("pos", "c"),
    )
    return exploded.select(
        "url",
        F.concat_ws("#", F.col("url"), F.col("c.position")).alias("chunk_id"),
        F.col("c.position").alias("position"),
        F.col("c.content").alias("content"),
        F.col("c.type").alias("type"),
        F.col("c.code_language").alias("code_language"),
        F.col("c.word_count").alias("word_count"),
        F.col("c.line_count").alias("line_count"),
        F.col("c.level").alias("level"),
        F.col("c.path").alias("path"),
        F.col("c.heading").alias("heading"),
        F.col("c.needs_merge").alias("needs_merge"),
        F.col("c.needs_split").alias("needs_split"),
        F.col("c.has_code").alias("has_code"),
        F.col("c.has_lists").alias("has_lists"),
        F.col("c.has_links").alias("has_links"),
    )


def sentence_chunks(
    text: str,
    chunk_size: int = 512,
    overlap: int = 50,
    min_chars: int = 12,
) -> list[dict]:
    """Sentence chunker with the PINNED contract mirroring the reference's
    Chonkie ``SentenceChunker(chunk_size, chunk_overlap, min_sentences_per_
    chunk=1, min_characters_per_sentence=12)`` (chunk_service.py:96-143;
    the library is absent from this container, so this closed-form contract
    is the testable spec — every rule below is mirrored 1:1 by the DuckDB
    oracle in oracles.py):

    1. split into sentence pieces after every ``[.!?]`` + whitespace run;
    2. min-chars pass: pieces accumulate forward until the joined unit is
       ≥ ``min_chars`` characters (a trailing short unit stands alone);
    3. tokens = whitespace word count;
    4. greedy pack: a chunk takes units while total tokens ≤ ``chunk_size``
       (always ≥ 1 unit);
    5. sentence-level overlap: the next chunk starts at the earliest unit
       of the previous chunk's suffix whose token sum ≤ ``overlap`` (never
       the whole chunk — progress is guaranteed); no qualifying suffix
       → no overlap.
    """
    if not text:
        return []
    pieces = [s for s in re.split(r"(?<=[.!?])\s+", text) if s.strip()]
    units: list[str] = []
    cur: list[str] = []
    for s in pieces:
        cur.append(s)
        if len(" ".join(cur)) >= min_chars:
            units.append(" ".join(cur))
            cur = []
    if cur:
        units.append(" ".join(cur))
    if not units:
        return []
    toks = [len(u.split()) for u in units]

    out: list[dict] = []
    s = 0
    n = len(units)
    while s < n:
        e, total = s, toks[s]
        while e + 1 < n and total + toks[e + 1] <= chunk_size:
            e += 1
            total += toks[e]
        out.append(
            {
                "content": " ".join(units[s : e + 1]),
                "token_count": total,
                "position": len(out),
            }
        )
        if e + 1 >= n:
            break
        s2, osum, j = e + 1, 0, e
        while j > s and osum + toks[j] <= overlap:
            osum += toks[j]
            s2 = j
            j -= 1
        s = s2
    return out


SENTENCE_CHUNK_STRUCT = T.StructType(
    [
        T.StructField("content", T.StringType()),
        T.StructField("token_count", T.IntegerType()),
        T.StructField("position", T.IntegerType()),
    ]
)


@F.pandas_udf(T.ArrayType(SENTENCE_CHUNK_STRUCT))
def sentence_chunk_udf(md: pd.Series) -> pd.Series:
    return pd.Series([sentence_chunks(m) for m in md])


def make_sentence_chunk_udf(
    chunk_size: int = 512, overlap: int = 50, min_chars: int = 12
):
    """Parametrized variant (request.max_chunk_size / chunk_overlap knobs,
    chunk_service.py:101-106)."""

    @F.pandas_udf(T.ArrayType(SENTENCE_CHUNK_STRUCT))
    def udf(md: pd.Series) -> pd.Series:
        return pd.Series(
            [sentence_chunks(m, chunk_size, overlap, min_chars) for m in md]
        )

    return udf


def chunk_dispatch(md_col: Column, chunker_type: str = "semantic") -> Column:
    """C3 dispatch (chunk_service.py:96,144-147)."""
    if chunker_type == "sentence":
        return sentence_chunk_udf(md_col)
    return chunk_markdown_udf(md_col)
