"""From-scratch robots.txt parser: MK1994/96 + 2008 wildcard extensions
(the reference's robotexclusionrulesparser semantics,
link_extractor.py:27,46): first-match-in-order, * / $ wildcards,
per-group crawl-delay."""

from eget_crawler_for_overflow_spark.functions.robots import (
    crawl_delay,
    robots_allowed,
)

H = "https://host0.example"


def test_prefix_disallow():
    rt = "User-agent: *\nDisallow: /private/"
    assert not robots_allowed(f"{H}/private/x", rt)
    assert robots_allowed(f"{H}/public/x", rt)
    assert robots_allowed(f"{H}/privateer", rt)  # '/private/' ⊄ '/privateer'
    # bare prefix matches any longer path (classic MK semantics)
    rt2 = "User-agent: *\nDisallow: /private"
    assert not robots_allowed(f"{H}/privateer", rt2)
    assert robots_allowed(f"{H}/priv", rt2)


def test_wildcard_star_and_dollar():
    rt = "User-agent: *\nDisallow: /*.pdf$"
    assert not robots_allowed(f"{H}/docs/file.pdf", rt)
    assert robots_allowed(f"{H}/docs/file.pdf.html", rt)  # $ anchors end
    rt2 = "User-agent: *\nDisallow: /a/*/secret"
    assert not robots_allowed(f"{H}/a/x/secret", rt2)
    assert not robots_allowed(f"{H}/a/x/y/secrets", rt2)
    assert robots_allowed(f"{H}/a/secret", rt2)


def test_first_match_wins_order():
    # MK1996 / robotexclusionrulesparser ordering (NOT longest-match)
    rt = "User-agent: *\nAllow: /dir/page\nDisallow: /dir"
    assert robots_allowed(f"{H}/dir/page", rt)
    assert not robots_allowed(f"{H}/dir/other", rt)
    rt_rev = "User-agent: *\nDisallow: /dir\nAllow: /dir/page"
    assert not robots_allowed(f"{H}/dir/page", rt_rev)  # disallow hits first


def test_empty_disallow_allows_everything():
    rt = "User-agent: *\nDisallow:"
    assert robots_allowed(f"{H}/anything", rt)


def test_query_string_matched():
    rt = "User-agent: *\nDisallow: /*?session="
    assert not robots_allowed(f"{H}/p?session=1", rt)
    assert robots_allowed(f"{H}/p?id=1", rt)


def test_other_agent_group_ignored():
    rt = "User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /nav"
    assert robots_allowed(f"{H}/anything", rt)
    assert not robots_allowed(f"{H}/nav", rt)


def test_stacked_agent_lines_share_group():
    rt = "User-agent: botA\nUser-agent: *\nDisallow: /x"
    assert not robots_allowed(f"{H}/x", rt)


def test_crawl_delay_and_comments():
    rt = "# corp robots\nUser-agent: *\nCrawl-delay: 2.5 # slow\nDisallow: /nav"
    assert crawl_delay(rt) == 2.5
    assert not robots_allowed(f"{H}/nav", rt)
    assert crawl_delay("User-agent: other\nCrawl-delay: 9") == 0.0


def test_missing_rules_allow_all():
    assert robots_allowed(f"{H}/x", None)
    assert robots_allowed(f"{H}/x", "")
    assert crawl_delay(None) == 0.0


def test_percent_decoding_both_sides():
    """Reference library semantics: pattern and target are both
    percent-decoded before matching (ADVICE r2)."""
    rt = "User-agent: *\nDisallow: /a%20b"
    assert not robots_allowed(f"{H}/a%20b", rt)  # decoded target matches
    assert not robots_allowed(f"{H}/a b", rt)  # already-decoded target too
    rt2 = "User-agent: *\nDisallow: /a b"
    assert not robots_allowed(f"{H}/a%20b", rt2)  # decoded pattern side


def test_percent_2f_stays_encoded():
    """%2F is NOT a path separator: an encoded slash in the URL must not
    match a literal-slash rule, and vice versa."""
    rt = "User-agent: *\nDisallow: /a/b"
    assert not robots_allowed(f"{H}/a/b", rt)
    assert robots_allowed(f"{H}/a%2Fb", rt)
    rt2 = "User-agent: *\nDisallow: /a%2Fb"
    assert not robots_allowed(f"{H}/a%2Fb", rt2)
    assert robots_allowed(f"{H}/a/b", rt2)


def test_encoded_star_becomes_wildcard():
    """%2A decodes to '*' before wildcard splitting (library order)."""
    rt = "User-agent: *\nDisallow: /x%2Ay"
    assert not robots_allowed(f"{H}/xANYTHINGy", rt)


def test_percent_00_is_not_a_slash_sentinel():
    """%00 (or a literal NUL) must not be confused with %2F by the
    decoder's slash-preservation mechanism."""
    rt = "User-agent: *\nDisallow: /a%2Fb"
    assert robots_allowed(f"{H}/a%00b", rt)  # NUL is not an encoded slash
    rt2 = "User-agent: *\nDisallow: /a%00b"
    assert not robots_allowed(f"{H}/a%00b", rt2)  # but it matches itself
    assert robots_allowed(f"{H}/a%2Fb", rt2)
