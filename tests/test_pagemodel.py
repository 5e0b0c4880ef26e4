"""Python page model ⇔ DuckDB SQL builders must agree row-for-row —
this pair is the foundation every oracle rests on."""

import sys

import duckdb
import pytest

from eget_crawler_for_overflow_spark import pagemodel as pm

SF = "/root/testdata/sf0.01"
N_PAGES, N_HOSTS = 5000, 64


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


@pytest.fixture(scope="module")
def docs(con):
    return con.sql(
        "SELECT doc_id, text, lang FROM documents ORDER BY doc_id"
    ).fetchall()


def test_pages_cte_matches_python(con, docs):
    q = (
        f"WITH {pm.duckdb_pages_cte(SF)} "
        "SELECT i, host, url, lang, md, title FROM pages_g ORDER BY i"
    )
    rows = con.sql(q).fetchall()
    assert len(rows) == N_PAGES
    for i, host, url, lang, md, title in rows[::7]:
        t, lg = docs[i % 500][1], docs[i % 500][2]
        assert host == pm.host_of(i, N_HOSTS)
        assert url == pm.url_of(i, N_HOSTS)
        assert lang == pm.expected_lang(i, lg)
        assert md == pm.expected_markdown(i, t, N_PAGES, N_HOSTS)
        assert title == pm.expected_title(i)


def test_links_cte_matches_python(con):
    q = (
        f"WITH {pm.duckdb_pages_cte(SF)}, {pm.duckdb_links_cte(SF)} "
        "SELECT src_url, dst_url FROM links_g"
    )
    got: dict[str, set] = {}
    for s, d in con.sql(q).fetchall():
        got.setdefault(s, set()).add(d)
    for i in range(0, N_PAGES, 13):
        assert got[pm.url_of(i, N_HOSTS)] == set(
            pm.expected_links(i, N_PAGES, N_HOSTS)
        ), f"page {i}"


def test_host_skew():
    hosts = [pm.host_of(i, N_HOSTS) for i in range(N_PAGES)]
    frac0 = hosts.count(0) / N_PAGES
    assert 0.4 < frac0 < 0.6  # host0 owns ~half: the salting test case


def test_doc_texts_single_spaced(con):
    # oracle word counts rely on \s+ splitting == python str.split()
    n = con.sql("SELECT count(*) FROM documents WHERE text LIKE '%  %'").fetchone()
    assert n[0] == 0
