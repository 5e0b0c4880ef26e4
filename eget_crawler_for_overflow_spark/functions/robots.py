"""robots.txt evaluation (reference: link_extractor.py:30-46).

The reference fetches ``{scheme}://{host}/robots.txt`` once per crawl and
checks ``is_allowed("*", url)``; a missing/failed robots.txt means
allow-all (the parse simply never happens — link_extractor.py:36-40).

Batch analog: a small ``robots(host string, rules_text string)`` table is
broadcast-joined to the frontier on ``host`` (SURVEY.md §2.4 J4) and a
pandas UDF evaluates the rules with stdlib ``urllib.robotparser``. Parsed
rule objects are memoized per distinct ``rules_text`` within each Arrow
batch — one parse per host per batch, not per row.
"""

from __future__ import annotations

from urllib import robotparser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _parser_for(rules_text: str) -> robotparser.RobotFileParser:
    p = robotparser.RobotFileParser()
    p.parse((rules_text or "").splitlines())
    return p


def robots_allowed(url: str, rules_text: str | None) -> bool:
    """Missing robots row / empty rules => allow (reference fetch-failure
    behavior)."""
    if not rules_text:
        return True
    try:
        return _parser_for(rules_text).can_fetch("*", url)
    except Exception:
        return True


def crawl_delay(rules_text: str | None) -> float:
    if not rules_text:
        return 0.0
    try:
        d = _parser_for(rules_text).crawl_delay("*")
        return float(d) if d else 0.0
    except Exception:
        return 0.0


@F.pandas_udf(T.BooleanType())
def robots_allowed_udf(url: pd.Series, rules_text: pd.Series) -> pd.Series:
    cache: dict[str, robotparser.RobotFileParser] = {}
    out = []
    for u, rt in zip(url, rules_text):
        if not rt or u is None:
            out.append(True)
            continue
        p = cache.get(rt)
        if p is None:
            p = _parser_for(rt)
            cache[rt] = p
        try:
            out.append(bool(p.can_fetch("*", u)))
        except Exception:
            out.append(True)
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def crawl_delay_udf(rules_text: pd.Series) -> pd.Series:
    cache: dict[str, float] = {}
    out = []
    for rt in rules_text:
        if not rt:
            out.append(0.0)
            continue
        if rt not in cache:
            cache[rt] = crawl_delay(rt)
        out.append(cache[rt])
    return pd.Series(out)
