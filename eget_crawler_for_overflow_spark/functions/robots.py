"""robots.txt evaluation (reference: link_extractor.py:27-46).

The reference fetches ``{scheme}://{host}/robots.txt`` once per crawl and
checks ``RobotExclusionRulesParser.is_allowed("*", url)``; a missing/
failed robots.txt means allow-all (the parse simply never happens —
link_extractor.py:36-40). That library implements the MK1994/96 syntax
plus the 2008 wildcard extensions, so this module is a from-scratch
parser with the same documented semantics (stdlib ``urllib.robotparser``
supports neither ``*`` nor ``$`` in paths):

* rule groups keyed by ``User-agent``; the ``*`` group applies;
* ``Allow``/``Disallow`` patterns may contain ``*`` (any chars) and a
  trailing ``$`` (end anchor); matching is against path+query, with BOTH
  pattern and target percent-decoded first (library behavior), except
  ``%2F`` which stays encoded;
* rules are evaluated IN FILE ORDER, first match wins (MK1996 ordering,
  the library's behavior — NOT Google's longest-match);
* an empty ``Disallow:`` matches nothing; no match ⇒ allowed;
* ``Crawl-delay`` is read from the applicable group.

Batch analog: a small ``robots(host string, rules_text string)`` table is
broadcast-joined to the frontier on ``host`` (SURVEY.md §2.4 J4) and a
pandas UDF evaluates the rules. Parsed rule objects are memoized per
distinct ``rules_text`` within each Arrow batch — one parse per host per
batch, not per row.
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urlparse


_PCT_2F = re.compile("(%2[fF])")


def _unquote_keep_slash(s: str) -> str:
    """Percent-decode like the reference library does to BOTH rule
    patterns and target paths before matching, except %2F stays encoded
    (an encoded slash is not a path separator). Split-and-rejoin instead
    of a placeholder character, so no input byte (e.g. %00 or a literal
    NUL) can collide with a sentinel."""
    parts = _PCT_2F.split(s)
    return "".join(
        p if _PCT_2F.fullmatch(p) else unquote(p) for p in parts
    )

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


class RobotRules:
    __slots__ = ("rules", "delay")

    def __init__(self, rules: list[tuple[bool, re.Pattern]], delay: float | None):
        self.rules = rules
        self.delay = delay

    def is_allowed(self, url: str) -> bool:
        try:
            p = urlparse(url)
            target = _unquote_keep_slash(p.path) or "/"
            if p.query:
                target += "?" + _unquote_keep_slash(p.query)
        except ValueError:
            return True
        for allow, pat in self.rules:
            if pat.match(target):
                return allow
        return True

    def crawl_delay(self) -> float:
        return float(self.delay) if self.delay else 0.0


def _compile_path(pattern: str) -> re.Pattern | None:
    if not pattern:
        return None  # empty Disallow/Allow matches nothing
    # decode BEFORE wildcard splitting (library order: an encoded %2A
    # decodes to '*' and then acts as a wildcard)
    pattern = _unquote_keep_slash(pattern)
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(re.escape(part) for part in pattern.split("*"))
    return re.compile(rx + ("$" if anchored else ""))


def _parser_for(rules_text: str) -> RobotRules:
    rules: list[tuple[bool, re.Pattern]] = []
    delay: float | None = None
    current_agents: list[str] = []
    in_star_group = False
    seen_rule_since_agent = True
    for raw in (rules_text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if seen_rule_since_agent:
                current_agents = []
                seen_rule_since_agent = False
            current_agents.append(value.lower())
            in_star_group = "*" in current_agents
            continue
        seen_rule_since_agent = True
        if not in_star_group:
            continue
        if field in ("allow", "disallow"):
            pat = _compile_path(value)
            if pat is not None:
                rules.append((field == "allow", pat))
        elif field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return RobotRules(rules, delay)


def robots_allowed(url: str, rules_text: str | None) -> bool:
    """Missing robots row / empty rules => allow (reference fetch-failure
    behavior)."""
    if not rules_text:
        return True
    try:
        return _parser_for(rules_text).is_allowed(url)
    except Exception:
        return True


def crawl_delay(rules_text: str | None) -> float:
    if not rules_text:
        return 0.0
    try:
        return _parser_for(rules_text).crawl_delay()
    except Exception:
        return 0.0


@F.pandas_udf(T.BooleanType())
def robots_allowed_udf(url: pd.Series, rules_text: pd.Series) -> pd.Series:
    cache: dict[str, RobotRules] = {}
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
            out.append(bool(p.is_allowed(u)))
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
