"""File-conversion surface (reference §2.11: PDF/DOCX/XLSX → markdown).

The reference exposes a pluggable converter registry
(/root/reference/services/converters/converter_factory.py:11-42) dispatching
on file type, with per-format converters (pdf_converter.py, docx_converter
.py, xlsx_converter.py). The decode libraries (PyMuPDF, python-docx,
openpyxl) are not in this container, so each converter's *decode* step is
stubbed behind NotImplementedError — but the registry, dispatch, size/type
gates (conversion_service.py:47-65), Spark plumbing (binaryFile source →
mapInPandas → markdown column), and the shared text-cleaning step
(base_converter.py:35-53) are real and tested.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_FILE_BYTES = 5 * 1024 * 1024  # conversion_service.py:47-53

_REGISTRY: dict[str, Callable[[bytes], str]] = {}


def register_converter(file_type: str, fn: Callable[[bytes], str]) -> None:
    """ConverterFactory.register_converter equivalent
    (converter_factory.py:11-16)."""
    _REGISTRY[file_type.lower()] = fn


def get_converter(file_type: str) -> Callable[[bytes], str]:
    try:
        return _REGISTRY[file_type.lower()]
    except KeyError:
        raise ValueError(f"unsupported file type: {file_type}") from None


# ASCII fast path for the reference's per-char category test: controls
# except \n\t (i.e. \x00-\x08, \x0b-\x1f, \x7f) -> space
_ASCII_CTRL = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")


def clean_text(text: str) -> str:
    """base_converter.py:35-53, operation-for-operation: control chars
    (Unicode category C*) except \n\t become a SPACE (not deleted); runs
    of whitespace-except-newline collapse to one space; >=3 newlines -> 2;
    every line ``strip()``ed on BOTH ends; overall strip."""
    if not text:
        return ""
    if text.isascii():
        text = _ASCII_CTRL.sub(" ", text)
    else:
        text = "".join(
            ch
            if ch in "\n\t" or not unicodedata.category(ch).startswith("C")
            else " "
            for ch in text
        )
    text = re.sub(r"[^\S\n]+", " ", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return "\n".join(line.strip() for line in text.split("\n")).strip()


def _stub(kind: str) -> Callable[[bytes], str]:
    def convert(payload: bytes) -> str:
        raise NotImplementedError(
            f"{kind} decoding requires libraries not present in this "
            "container (see module docstring); plug a real decoder in via "
            "register_converter()"
        )

    return convert


register_converter("pdf", _stub("PDF"))
register_converter("docx", _stub("DOCX"))
register_converter("xlsx", _stub("XLSX"))
# plain text converts for real — exercises the full pipeline
register_converter("txt", lambda b: clean_text(b.decode("utf-8", "replace")))
register_converter("md", lambda b: clean_text(b.decode("utf-8", "replace")))

CONVERT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("file_type", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def convert_files(files: DataFrame) -> DataFrame:
    """binaryFile-source DataFrame (path, content) → markdown. Per-file
    errors land in the error column, never fail the task (the reference
    returns per-file error envelopes, converter.py:70-89)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "file_type": [], "markdown": [], "error": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                ftype = str(path).rsplit(".", 1)[-1].lower()
                out["path"].append(path)
                out["file_type"].append(ftype)
                md, err = None, None
                try:
                    payload = bytes(content)
                    if len(payload) > MAX_FILE_BYTES:
                        raise ValueError("file exceeds 5MB limit")
                    md = get_converter(ftype)(payload)
                except Exception as e:  # noqa: BLE001
                    err = f"{type(e).__name__}: {e}"
                out["markdown"].append(md)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(run, CONVERT_SCHEMA)


def read_binary_files(spark, path: str, glob: str = "*") -> DataFrame:
    """S4 source: spark.read.format('binaryFile')."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
