"""Deterministic synthetic web-corpus model ("pages" table).

The engine's input is an Iceberg/parquet table of Common-Crawl-style pages
``(url string, warc_ts timestamp, html binary, text string, lang string)``
(BASELINE.json ``input_hint``). No real pages exist in the sandbox, so this
module *derives* a corpus deterministically from the driver-provided
``documents`` table (TESTDATA.md) — pure integer/string formulas of the page
index ``i`` and the document row ``i % n_docs``.

Every formula exists twice, and the pair is the correctness contract:

* pure-Python (`page_record`, `children`, `host_of`, ...) — used by the
  Spark-side fixture generator (fixtures.py) and by pytest;
* DuckDB SQL builders (`duckdb_pages_cte`, `duckdb_links_cte`, ...) — used
  by ``__spark_entry__.oracle_sql`` so the driver can check the *real*
  engine (HTML parsing, UDFs, BFS loop) against closed-form expectations.

The ``text`` column is the page's expected extracted markdown — the
byte-identical-extraction target (reference semantics:
/root/reference/services/scraper/scraper.py:177-198).

HTML templates cover every extraction branch of the reference
(FIXTURES.md §1): all five main-content patterns + largest-div fallback
(scraper.py:155-175), removable elements (scraper.py:97-120), og:title vs
<title> (scraper.py:127-132), all four language-marker fallbacks
(structured_data.py:11-38), and absolute/relative/fragment/mailto/js/
off-domain/duplicate links (link_extractor.py:48-126).
"""

from __future__ import annotations

import datetime as _dt
import re

# ---------------------------------------------------------------------------
# corpus sizing per scale tier (FIXTURES.md §7)
# ---------------------------------------------------------------------------

TIERS = {
    "sf0.001": {"n_pages": 500, "n_hosts": 8},
    "sf0.01": {"n_pages": 5000, "n_hosts": 64},
    "sf0.1": {"n_pages": 500_000, "n_hosts": 1024},
}

EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)

# formula constants (arbitrary primes; BIGINT-safe for i < 2**40)
HOST_MIX = 2654435761
HOST_STEP = 40503
CHILD_MIX = 7919
CHILD_STEP = 104729


def tier_for_dir(sf_dir: str) -> str:
    s = sf_dir.rstrip("/")
    for t in ("sf0.001", "sf0.01", "sf0.1"):
        if s.endswith(t):
            return t
    return "sf0.01"


def sizing(sf_dir: str) -> tuple[int, int]:
    t = TIERS[tier_for_dir(sf_dir)]
    return t["n_pages"], t["n_hosts"]


# ---------------------------------------------------------------------------
# pure-Python formulas (source of truth)
# ---------------------------------------------------------------------------


def host_of(i: int, n_hosts: int) -> int:
    """Skewed host assignment: host 0 owns ~50% of all pages (tests salting)."""
    if (i * HOST_MIX) % 100 < 50:
        return 0
    return 1 + (i * HOST_STEP + 7) % (n_hosts - 1)


def hostname(h: int) -> str:
    return f"host{h}.example"


def url_of(i: int, n_hosts: int) -> str:
    return f"https://{hostname(host_of(i, n_hosts))}/p/{i}"


def degree(i: int) -> int:
    return 2 + i % 3


def children(i: int, n_pages: int) -> list[int]:
    return [(i * CHILD_MIX + (k + 1) * CHILD_STEP) % n_pages for k in range(degree(i))]


def nav_url(i: int, n_hosts: int) -> str:
    """The dead same-host link every page carries (<nav><a href="/nav">)."""
    return f"https://{hostname(host_of(i, n_hosts))}/nav"


def rel_url(i: int, n_pages: int, n_hosts: int) -> str:
    """Relative link /p/{c1} resolved against page i's own host."""
    c1 = children(i, n_pages)[1]
    return f"https://{hostname(host_of(i, n_hosts))}/p/{c1}"


def expected_markdown(i: int, doc_text: str, n_pages: int, n_hosts: int) -> str:
    """The byte-identical extraction target for page i."""
    c0 = children(i, n_pages)[0]
    c0url = url_of(c0, n_hosts)
    blocks = [
        f"# Doc {i}",
        f"{doc_text} See [next]({c0url}).",
        "## Details",
        f"Details for page {i}.",
    ]
    b = i % 4
    if b == 0:
        blocks.append(f"```python\nprint({i})\n```")
    elif b == 1:
        blocks.append(f"- alpha {i}\n- beta")
    elif b == 2:
        blocks.append(f"| k | v |\n|---|---|\n| a | {i % 10} |")
    else:
        blocks.append(f"Closing note {i}.")
    return "\n\n".join(blocks) + "\n"


def expected_lang(i: int, doc_lang: str) -> str:
    """Ground-truth page language: '' when no marker is present (m==4),
    matching structured_data.py:11-38 fallback-to-empty behavior."""
    return "" if i % 5 == 4 else doc_lang


def expected_title(i: int) -> str:
    """og:title wins over <title> (scraper.py:127-132)."""
    return f"OG Doc {i}" if i % 3 == 0 else f"Doc {i}"


def expected_links(i: int, n_pages: int, n_hosts: int) -> list[str]:
    """Reference ``LinkExtractor.extract_links`` output for page i with
    base_domain = page i's own host (link_extractor.py:94-126): normalized,
    same-domain-filtered, set-deduped. First-occurrence order."""
    h = host_of(i, n_hosts)
    out: list[str] = []
    seen: set[str] = set()

    def add(u: str) -> None:
        if u not in seen:
            seen.add(u)
            out.append(u)

    add(nav_url(i, n_hosts))  # <nav><a href="/nav"> resolves on own host
    for c in children(i, n_pages):
        if host_of(c, n_hosts) == h:
            add(url_of(c, n_hosts))
    add(url_of(i, n_hosts))  # '#top' fragment-only -> self after normalize
    # mailto:, javascript:, off-domain -> dropped by normalize/domain filter
    c0 = children(i, n_pages)[0]
    if host_of(c0, n_hosts) == h:
        add(url_of(c0, n_hosts))  # '?utm=1' variant canonicalizes to c0 (dup)
    add(rel_url(i, n_pages, n_hosts))  # relative /p/{c1} on own host
    # NOTE: in-content <a> (the "next" link) is host_of(c0)'s URL — kept only
    # if same host, already covered by the children loop.
    return out


def expected_links_all(i: int, n_pages: int, n_hosts: int) -> list[str]:
    """``extract_links`` output for page i with ``same_domain=False`` —
    document order, first-occurrence deduped, NO host filter. Off-domain
    children, mailto:/javascript: pseudo-URLs (normalize keeps them; the
    frontier's F8 guard drops them at admission, but they still consume a
    link_pos), the offsite absolute link, and the relative ``/p/{c1}``
    resolved against page i's OWN host (a distinct URL when host_of(c1)
    differs) all appear."""
    h = host_of(i, n_hosts)
    kids = children(i, n_pages)
    out: list[str] = []
    seen: set[str] = set()

    def add(u: str) -> None:
        if u not in seen:
            seen.add(u)
            out.append(u)

    add(nav_url(i, n_hosts))
    add(url_of(kids[0], n_hosts))  # in-content "next" link
    for c in kids:
        add(url_of(c, n_hosts))
    add(url_of(i, n_hosts))  # '#top' -> self
    add("mailto:x@example.com")
    add("javascript:void(0)")
    add("https://offsite.example.net/x")
    # '?utm=1' dup canonicalizes to kids[0] (always already present)
    add(f"https://{hostname(h)}/p/{kids[1]}")  # relative link, own host
    return out


def page_html(i: int, doc_text: str, doc_lang: str, n_pages: int, n_hosts: int) -> str:
    h = host_of(i, n_hosts)
    kids = children(i, n_pages)
    c0url = url_of(kids[0], n_hosts)
    m = i % 5  # language-marker variant
    v = i % 6  # main-content wrapper variant
    b = i % 4  # extra block variant
    t = i % 3  # og:title presence

    langattr = f' lang="{doc_lang}-US"' if m == 0 else ""
    metas = [f'<meta name="description" content="Synthetic page {i}">']
    if t == 0:
        metas.append(f'<meta property="og:title" content="OG Doc {i}">')
    if i % 6 == 0:  # valid JSON-LD (structured_data.py:40-53)
        metas.append(
            '<script type="application/ld+json">'
            f'{{"@type":"Thing","name":"Doc {i}"}}</script>'
        )
    elif i % 6 == 3:  # invalid JSON-LD: parse failure is skipped, not fatal
        metas.append('<script type="application/ld+json">{oops</script>')
    if i % 7 == 0:  # remaining T4 meta-mapping branches (scraper.py:135-152)
        metas.append(f'<meta name="author" content="Author {i % 5}">')
        metas.append('<meta name="keywords" content="alpha,beta">')
        metas.append(
            '<meta property="article:published_time" '
            f'content="2025-01-0{i % 9 + 1}">'
        )
    if i % 7 == 3:
        metas.append(f'<meta property="og:image" content="https://img/{i}.png">')
    if i % 8 == 0:  # TwitterCard branch (structured_data.py:71-81)
        metas.append('<meta name="twitter:card" content="summary">')
        metas.append(f'<meta name="twitter:title" content="TW Doc {i}">')
    if m == 1:
        metas.append(f'<meta http-equiv="content-language" content="{doc_lang}">')
    elif m == 2:
        metas.append(f'<meta name="language" content="{doc_lang}">')
    elif m == 3:
        metas.append(f'<meta property="og:locale" content="{doc_lang}_XX">')

    wrappers = [
        ("<main>", "</main>"),
        ("<article>", "</article>"),
        ('<div id="content">', "</div>"),
        ('<div class="main-article">', "</div>"),
        ('<div role="main">', "</div>"),
        ("<div>", "</div>"),  # fallback: largest text container
    ]
    w_open, w_close = wrappers[v]

    if b == 0:
        bhtml = f'<pre><code class="language-python">print({i})</code></pre>'
    elif b == 1:
        bhtml = f"<ul><li>alpha {i}</li><li>beta</li></ul>"
    elif b == 2:
        bhtml = (
            "<table><tr><th>k</th><th>v</th></tr>"
            f"<tr><td>a</td><td>{i % 10}</td></tr></table>"
        )
    else:
        bhtml = f"<p>Closing note {i}.</p>"

    anchors = "".join(
        f'<a href="{url_of(c, n_hosts)}">c{k}</a>' for k, c in enumerate(kids)
    )
    anchors += (
        '<a href="#top">top</a>'
        '<a href="mailto:x@example.com">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="https://offsite.example.net/x">off</a>'
        f'<a href="{c0url}?utm=1">dup</a>'
        f'<a href="/p/{kids[1]}">rel</a>'
    )

    return (
        f"<html{langattr}><head><title>Doc {i}</title>"
        "<script>var x=1;</script><style>p{color:red}</style>"
        f'{"".join(metas)}</head><body>'
        '<nav><a href="/nav">site nav</a></nav>'
        f"{w_open}<h1>Doc {i}</h1>"
        f'<p>{doc_text} See <a href="{c0url}">next</a>.</p>'
        f"<h2>Details</h2><p>Details for page {i}.</p>{bhtml}{w_close}"
        f'<div class="links">{anchors}</div>'
        "<footer>(c) example</footer></body></html>"
    )


def page_record(
    i: int, doc_text: str, doc_lang: str, n_pages: int, n_hosts: int
) -> dict:
    """One row of the pages table (exact input_hint shape)."""
    return {
        "url": url_of(i, n_hosts),
        "warc_ts": EPOCH + _dt.timedelta(seconds=i),
        "html": page_html(i, doc_text, doc_lang, n_pages, n_hosts).encode("utf-8"),
        "text": expected_markdown(i, doc_text, n_pages, n_hosts),
        "lang": expected_lang(i, doc_lang),
    }


# ---------------------------------------------------------------------------
# DuckDB SQL builders (oracle side). DuckDB-dialect; semantics must equal the
# Python formulas above (pytest cross-checks them row-for-row at sf0.01).
# ---------------------------------------------------------------------------


def ducksql_host(i: str, n_hosts: int) -> str:
    return (
        f"(CASE WHEN ({i} * {HOST_MIX}) % 100 < 50 THEN 0 "
        f"ELSE 1 + ({i} * {HOST_STEP} + 7) % {n_hosts - 1} END)"
    )


def ducksql_url(i: str, n_hosts: int) -> str:
    return f"('https://host' || {ducksql_host(i, n_hosts)} || '.example/p/' || {i})"


def ducksql_child(i: str, k: str, n_pages: int) -> str:
    return f"(({i} * {CHILD_MIX} + ({k} + 1) * {CHILD_STEP}) % {n_pages})"


def duckdb_pages_cte(sf_dir: str, name: str = "pages_g") -> str:
    """CTE producing (i, host, url, lang, md, title, doc_text) from the
    pre-registered ``documents`` view — the oracle's view of the corpus."""
    n_pages, n_hosts = sizing(sf_dir)
    n_docs = 5000 if tier_for_dir(sf_dir) == "sf0.1" else 500
    c0 = ducksql_child("ids.i", "0", n_pages)
    md = (
        f"'# Doc ' || ids.i || chr(10) || chr(10) || d.text || "
        f"' See [next](' || {ducksql_url(c0, n_hosts)} || ').' || chr(10) || chr(10) || "
        f"'## Details' || chr(10) || chr(10) || 'Details for page ' || ids.i || '.' "
        f"|| chr(10) || chr(10) || "
        f"CASE ids.i % 4 "
        f"WHEN 0 THEN '```python' || chr(10) || 'print(' || ids.i || ')' || chr(10) || '```' "
        f"WHEN 1 THEN '- alpha ' || ids.i || chr(10) || '- beta' "
        f"WHEN 2 THEN '| k | v |' || chr(10) || '|---|---|' || chr(10) || '| a | ' || (ids.i % 10) || ' |' "
        f"ELSE 'Closing note ' || ids.i || '.' END || chr(10)"
    )
    return (
        f"{name} AS (SELECT ids.i AS i, {ducksql_host('ids.i', n_hosts)} AS host, "
        f"{ducksql_url('ids.i', n_hosts)} AS url, "
        f"CASE WHEN ids.i % 5 = 4 THEN '' ELSE d.lang END AS lang, "
        f"{md} AS md, "
        f"CASE WHEN ids.i % 3 = 0 THEN 'OG Doc ' || ids.i ELSE 'Doc ' || ids.i END AS title, "
        f"d.text AS doc_text "
        f"FROM generate_series(0, {n_pages - 1}) ids(i) "
        f"JOIN documents d ON ids.i % {n_docs} = d.doc_id)"
    )


def duckdb_links_cte(sf_dir: str, name: str = "links_g", pages: str = "pages_g") -> str:
    """CTE of the same-domain link graph (src_url, dst_url), distinct —
    exactly `expected_links` (per-page base domain), as a relation."""
    n_pages, n_hosts = sizing(sf_dir)
    c = ducksql_child("p.i", "g.k", n_pages)
    return (
        f"{name} AS ("
        # real children on the same host
        f"SELECT DISTINCT p.url AS src_url, {ducksql_url(c, n_hosts)} AS dst_url "
        f"FROM {pages} p, generate_series(0, 3) g(k) "
        f"WHERE g.k < 2 + p.i % 3 AND {ducksql_host(c, n_hosts)} = p.host "
        # '#top' -> self
        f"UNION SELECT url, url FROM {pages} "
        # '/nav' dead link on own host
        f"UNION SELECT url, 'https://host' || host || '.example/nav' FROM {pages} "
        # relative '/p/{c1}' resolved against own host
        f"UNION SELECT p.url, 'https://host' || p.host || '.example/p/' || "
        f"{ducksql_child('p.i', '1', n_pages)} FROM {pages} p"
        f")"
    )


def duckdb_links_pos_cte(
    sf_dir: str, name: str = "links_pos", pages: str = "pages_g"
) -> str:
    """CTE of the UNFILTERED link list with document positions
    (src_url, dst, pos) — exactly ``expected_links_all``: per-(src,dst)
    MIN document ord, then ``row_number`` = the engine's ``posexplode``
    link_pos over the same_domain=False links array."""
    n_pages, n_hosts = sizing(sf_dir)
    ck = ducksql_child("p.i", "g.k", n_pages)
    c0 = ducksql_child("p.i", "0", n_pages)
    c1 = ducksql_child("p.i", "1", n_pages)
    return (
        f"{name} AS ("
        f"SELECT src_url, dst, CAST(row_number() OVER "
        f"(PARTITION BY src_url ORDER BY mo) - 1 AS INT) AS pos "
        f"FROM (SELECT src_url, dst, MIN(ord) AS mo FROM ("
        # document order: nav, in-content c0, anchor children, #top self,
        # mailto, javascript, offsite, (c0?utm dup omitted: never first),
        # relative /p/{c1} on own host
        f"SELECT p.url AS src_url, 0 AS ord, "
        f"'https://host' || p.host || '.example/nav' AS dst FROM {pages} p "
        f"UNION ALL SELECT p.url, 1, {ducksql_url(c0, n_hosts)} FROM {pages} p "
        f"UNION ALL SELECT p.url, 2 + g.k, {ducksql_url(ck, n_hosts)} "
        f"FROM {pages} p, generate_series(0, 3) g(k) WHERE g.k < 2 + p.i % 3 "
        f"UNION ALL SELECT url, 10, url FROM {pages} "
        f"UNION ALL SELECT url, 11, 'mailto:x@example.com' FROM {pages} "
        f"UNION ALL SELECT url, 12, 'javascript:void(0)' FROM {pages} "
        f"UNION ALL SELECT url, 13, 'https://offsite.example.net/x' FROM {pages} "
        f"UNION ALL SELECT p.url, 14, 'https://host' || p.host || "
        f"'.example/p/' || {c1} FROM {pages} p"
        f") GROUP BY 1, 2))"
    )
