"""URL canonicalization and link extraction.

Reference semantics (/root/reference/services/crawler/link_extractor.py):

* ``_normalize_url`` (:48-67): ``urljoin(base, href)`` then strip
  ``fragment``/``params``/``query`` via ``urlparse(...)._replace(...)``.
  We use the same stdlib calls, so corner cases (scheme-relative refs,
  ``..`` traversal, mailto/javascript pseudo-URLs) match exactly.
* ``_should_include_url`` (:69-92): same-domain, exclude regex, include
  regex — Python ``re`` semantics (Java ``rlike`` differs: inline flags,
  ``\\Z``, possessive quantifiers — SURVEY.md §7.4.6), hence pandas UDFs.
* ``extract_links`` (:94-126): every ``<a href>`` in document order;
  the reference returns a ``set`` — we return first-occurrence order for
  determinism (SURVEY.md §2.7).

URL identity in the engine is ``xxhash64(url)`` (Spark built-in, JVM-side);
the full string is carried for collision audit (SURVEY.md §2.3 T2).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .htmllib import parse_html


def normalize_url(href: str, base_url: str) -> str | None:
    try:
        absolute = urljoin(base_url, href)
        parsed = urlparse(absolute)
        return parsed._replace(fragment="", params="", query="").geturl()
    except Exception:
        return None


def host_of_url(url: str) -> str:
    try:
        return urlparse(url).netloc
    except Exception:
        return ""


def extract_links(
    html: str,
    base_url: str,
    base_domain: str | None = None,
    exclude: list[re.Pattern] | None = None,
    include: list[re.Pattern] | None = None,
    same_domain: bool = True,
    robots_allowed=None,
) -> list[str]:
    """Reference ``LinkExtractor.extract_links`` with deterministic
    first-occurrence ordering. ``base_domain`` defaults to the crawl seed's
    netloc in the engine; standalone callers get the page's own host."""
    return extract_links_from_root(
        parse_html(html),
        base_url,
        base_domain=base_domain,
        exclude=exclude,
        include=include,
        same_domain=same_domain,
        robots_allowed=robots_allowed,
    )


def extract_links_from_root(
    root,
    base_url: str,
    base_domain: str | None = None,
    exclude: list[re.Pattern] | None = None,
    include: list[re.Pattern] | None = None,
    same_domain: bool = True,
    robots_allowed=None,
) -> list[str]:
    """Link extraction over an already-parsed tree (the crawl hot path
    shares one parse between content and link extraction)."""
    if base_domain is None:
        base_domain = host_of_url(base_url)
    out: list[str] = []
    seen: set[str] = set()
    for a in root.find_all("a", pred=lambda x: x.get("href") is not None):
        u = normalize_url(a.get("href"), base_url)
        if not u:
            continue
        if same_domain and host_of_url(u) != base_domain:
            continue
        if exclude and any(p.search(u) for p in exclude):
            continue
        if include and not any(p.search(u) for p in include):
            continue
        if robots_allowed is not None and not robots_allowed(u):
            continue
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


# ---------------------------------------------------------------------------
# pandas UDFs
# ---------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def canonicalize_udf(href: pd.Series, base: pd.Series) -> pd.Series:
    return pd.Series(
        [normalize_url(h, b) if h is not None else None for h, b in zip(href, base)]
    )


@F.pandas_udf(T.StringType())
def host_udf(url: pd.Series) -> pd.Series:
    return pd.Series([host_of_url(u) if u is not None else "" for u in url])


def make_link_udf(
    base_domain: str | None = None,
    exclude: list[str] | None = None,
    include: list[str] | None = None,
    same_domain: bool = True,
):
    """Factory: link-extraction pandas UDF bound to a crawl config.
    Patterns compile once per executor (module closure), not per row."""
    exc = [re.compile(p) for p in (exclude or [])]
    inc = [re.compile(p) for p in (include or [])]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
        out = []
        for h, b in zip(html, base_url):
            if h is None:
                out.append([])
                continue
            if isinstance(h, (bytes, bytearray, memoryview)):
                h = bytes(h).decode("utf-8", errors="replace")
            dom = base_domain if base_domain is not None else host_of_url(b)
            out.append(
                extract_links(
                    h, b, base_domain=dom, exclude=exc, include=inc,
                    same_domain=same_domain,
                )
            )
        return pd.Series(out)

    return links_udf


def make_pattern_filter_udf(exclude: list[str] | None, include: list[str] | None):
    """Boolean pandas UDF applying exclude-then-include Python-``re``
    semantics (link_extractor.py:83-92)."""
    exc = [re.compile(p) for p in (exclude or [])]
    inc = [re.compile(p) for p in (include or [])]

    @F.pandas_udf(T.BooleanType())
    def keep_udf(url: pd.Series) -> pd.Series:
        out = []
        for u in url:
            if u is None:
                out.append(False)
            elif any(p.search(u) for p in exc):
                out.append(False)
            elif inc and not any(p.search(u) for p in inc):
                out.append(False)
            else:
                out.append(True)
        return pd.Series(out)

    return keep_udf


def url_hash(col) -> Column:
    """URL identity hash — JVM-side xxhash64, no Python involved."""
    return F.xxhash64(col)
