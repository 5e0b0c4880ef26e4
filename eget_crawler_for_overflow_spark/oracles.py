"""DuckDB oracle SQL for every oracle-checkable query in queries.py.

The oracles are *independent* implementations: closed-form pagemodel
formulas (never the engine's HTML parsing) for the crawl slice, and
mirrored-but-handwritten SQL for the relational/dedup operators. md5 is
the cross-engine hash. Types are cast to match Spark's output types.

Generated at import time for the driver's correctness tier (sf0.01:
n_pages=5000, n_hosts=64, n_docs=500).
"""

from __future__ import annotations

from . import pagemodel as pm

SF = "/root/testdata/sf0.01"
N_PAGES, N_HOSTS = pm.sizing(SF)

PAGES = pm.duckdb_pages_cte(SF)
LINKS = pm.duckdb_links_cte(SF)

EXCLUDE_PAT = r"/p/\d*[13579]$"
INCLUDE_PAT = r"/p/1\d*$"
SEED_IDS = "(0, 2, 4, 5, 7)"
CRAWL_DEPTH = 5


def _c0(i: str = "i") -> str:
    return pm.ducksql_child(i, "0", N_PAGES)


ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------------------
# extraction slice
# ---------------------------------------------------------------------------

ORACLES["extract_text"] = f"WITH {PAGES} SELECT url, md AS markdown FROM pages_g"

ORACLES["extract_text_matches"] = (
    f"WITH {PAGES} SELECT TRUE AS is_equal, COUNT(*) AS n FROM pages_g GROUP BY 1"
)

ORACLES["lang_extract"] = f"WITH {PAGES} SELECT url, lang AS language FROM pages_g"

ORACLES["title_extract"] = f"WITH {PAGES} SELECT url, title FROM pages_g"

ORACLES["structured_og"] = f"""
WITH {PAGES}
SELECT url,
  CASE WHEN i % 3 = 0 THEN 'OG Doc ' || i ELSE '' END AS og_title,
  CASE WHEN i % 5 = 3 THEN lang || '_XX' ELSE '' END AS og_locale,
  CASE WHEN i % 6 = 0
       THEN '{{"@type":"Thing","name":"Doc ' || i || '"}}'
       ELSE '' END AS json_ld0
FROM pages_g
"""

ORACLES["metadata_extract"] = f"""
WITH {PAGES}
SELECT url,
  CASE WHEN i % 7 = 0 THEN 'Author ' || (i % 5) ELSE '' END AS author,
  CASE WHEN i % 7 = 0 THEN 'alpha,beta' ELSE '' END AS keywords,
  CASE WHEN i % 7 = 0 THEN '2025-01-0' || (i % 9 + 1) ELSE '' END AS published_date,
  CASE WHEN i % 7 = 3 THEN 'https://img/' || i || '.png' ELSE '' END AS image,
  CASE WHEN i % 8 = 0 THEN 'summary' ELSE '' END AS tw_card,
  CASE WHEN i % 8 = 0 THEN 'TW Doc ' || i ELSE '' END AS tw_title
FROM pages_g
"""

ORACLES["link_explode"] = (
    f"WITH {PAGES}, {LINKS} SELECT src_url AS url, dst_url AS link FROM links_g"
)

ORACLES["url_normalize"] = f"""
WITH {PAGES}
SELECT url, '/p/' || i AS href, url AS canon FROM pages_g
UNION ALL SELECT url, url || '#sec', url FROM pages_g
UNION ALL SELECT url, url || '?a=1&b=2', url FROM pages_g
UNION ALL SELECT url, 'mailto:x@example.com', 'mailto:x@example.com' FROM pages_g
"""

ORACLES["host_groups"] = f"""
WITH {PAGES}, {LINKS}
SELECT regexp_extract(dst_url, 'https://([^/]+)/', 1) AS host,
       COUNT(*) AS n_links
FROM links_g GROUP BY 1
"""

ORACLES["exclude_patterns"] = (
    f"WITH {PAGES} SELECT url FROM pages_g "
    f"WHERE NOT regexp_matches(url, '{EXCLUDE_PAT}')"
)

ORACLES["include_patterns"] = (
    f"WITH {PAGES} SELECT url FROM pages_g "
    f"WHERE regexp_matches(url, '{INCLUDE_PAT}')"
)

ORACLES["host_filter"] = (
    f"WITH {PAGES}, {LINKS} SELECT src_url AS url, dst_url AS link FROM links_g"
)

ORACLES["depth_gate"] = f"""
WITH {PAGES}
SELECT url, CAST((i * 31) % 12 AS INT) AS depth FROM pages_g
WHERE (i * 31) % 12 <= 3
"""

ORACLES["page_budget"] = f"""
WITH {PAGES},
r AS (SELECT url, ROW_NUMBER() OVER (ORDER BY i) AS rn FROM pages_g)
SELECT url, CAST(rn - 1 AS BIGINT) AS enqueue_seq FROM r WHERE rn <= 100
"""

ORACLES["host_budget_topk"] = f"""
WITH {PAGES},
r AS (SELECT 'host' || host || '.example' AS host, url,
             ROW_NUMBER() OVER (PARTITION BY host ORDER BY i) AS rn
      FROM pages_g)
SELECT host, url, CAST(rn AS INT) AS host_rank FROM r WHERE rn <= 3
"""

ORACLES["frontier_dedup"] = f"""
WITH {PAGES}, {LINKS}
SELECT l.dst_url AS link, MIN(p.i) AS first_src
FROM links_g l JOIN pages_g p ON l.src_url = p.url
WHERE p.i % 97 = 0 GROUP BY 1
"""

_BFS_REACH = f"""
WITH RECURSIVE {PAGES}, {LINKS},
reach(url, depth) AS (
  SELECT url, 0 FROM pages_g WHERE i IN {SEED_IDS}
  UNION ALL
  SELECT l.dst_url, r.depth + 1
  FROM reach r JOIN links_g l ON l.src_url = r.url
  WHERE r.depth < {CRAWL_DEPTH}
),
closure AS (SELECT url, MIN(depth) AS depth FROM reach GROUP BY url)
"""

ORACLES["bfs_reach"] = _BFS_REACH + "SELECT url, CAST(depth AS INT) AS depth FROM closure"

ORACLES["bfs_depth_counts"] = (
    _BFS_REACH
    + "SELECT CAST(depth AS INT) AS depth, COUNT(*) AS n_urls FROM closure GROUP BY 1"
)

ORACLES["crawl_stats"] = (
    _BFS_REACH
    + """
SELECT CASE WHEN p.url IS NULL THEN 'missing' ELSE 'extracted' END AS status,
       COUNT(*) AS n
FROM closure r LEFT JOIN pages_g p ON r.url = p.url GROUP BY 1
"""
)

# robots fixture: host%4==2 disallows path prefix /p/1 (urllib.robotparser
# prefix semantics); the other variants never match page urls
ORACLES["robots_gate"] = f"""
WITH {PAGES}
SELECT url,
  CASE WHEN host % 4 = 2
       AND url LIKE 'https://host' || host || '.example/p/1%'
       THEN FALSE ELSE TRUE END AS allowed
FROM pages_g
"""

ORACLES["md_clean"] = (
    "SELECT doc_id, '# Title ' || text || '  -x end' AS cleaned FROM documents"
)

# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------

# Two chunks per page: the reference never flushes on blank lines (its
# blank-line elif is dead code — semantic_chunker.py:101-110), so all
# content between headers coalesces; a code fence closes with everything
# accumulated before it inside the code chunk (semantic_chunker.py:51-71).
_CHUNKS = f"""
WITH {PAGES},
chunks AS (
  SELECT url, 0 AS position,
         doc_text || ' See [next](' || {pm.ducksql_url(_c0(), N_HOSTS)} || ').' AS content,
         'text' AS type,
         CAST(len(string_split_regex(trim(doc_text), '\\s+')) + 2 AS INT) AS word_count,
         CAST(NULL AS VARCHAR) AS code_language
  FROM pages_g
  UNION ALL
  SELECT url, 1,
    'Details for page ' || i || '.' || chr(10) || chr(10) ||
    CASE i % 4
      WHEN 0 THEN '```python' || chr(10) || 'print(' || i || ')' || chr(10) || '```'
      WHEN 1 THEN '- alpha ' || i || chr(10) || '- beta'
      WHEN 2 THEN '| k | v |' || chr(10) || '|---|---|' || chr(10) || '| a | ' || (i % 10) || ' |'
      ELSE 'Closing note ' || i || '.' END,
    CASE i % 4 WHEN 0 THEN 'code' WHEN 2 THEN 'table' ELSE 'text' END,
    CASE i % 4 WHEN 0 THEN 7 WHEN 1 THEN 9 WHEN 2 THEN 15 ELSE 7 END,
    CASE i % 4 WHEN 0 THEN 'python' ELSE NULL END
  FROM pages_g
)
"""

ORACLES["semantic_chunks"] = (
    _CHUNKS
    + "SELECT url, CAST(position AS INT) AS position, content, type, "
    "word_count, code_language FROM chunks"
)

ORACLES["chunk_positions"] = (
    _CHUNKS
    + "SELECT url, CAST(position AS INT) AS position, "
    "url || '#' || position AS chunk_id FROM chunks"
)

ORACLES["chunk_stats"] = (
    _CHUNKS
    + "SELECT type, COUNT(*) AS n_chunks, CAST(SUM(word_count) AS BIGINT) "
    "AS total_words FROM chunks GROUP BY 1"
)

# flagship integration: per-language corpus stats over quality-bucketed
# chunks — chunk contents come from the closed-form _CHUNKS formulas, the
# language from the page model, token/quality math mirrored exactly
_STOP = "['the','a','and','of','to','is','in']"
ORACLES["training_pipeline"] = (
    _CHUNKS
    + f""",
feats AS (
  SELECT p.lang AS language, c.type,
    CAST(len(string_split_regex(trim(c.content), '\\s+')) AS INT) AS ws_tokens,
    CAST(list_sum([(length(w) + 3) // 4
          for w in string_split_regex(trim(c.content), '\\s+')]) AS INT) AS bpe_tokens,
    CAST(CASE WHEN len(string_split_regex(c.content, '\\s+')) >= 20 AND
         len(list_filter(string_split_regex(c.content, '\\s+'),
             x -> list_contains({_STOP}, lower(x)))) * 100
         >= len(string_split_regex(c.content, '\\s+')) * 5 THEN 2
         WHEN len(string_split_regex(c.content, '\\s+')) >= 5 THEN 1
         ELSE 0 END AS INT) AS quality_bucket
  FROM chunks c JOIN pages_g p ON p.url = c.url)
SELECT language, type, quality_bucket,
       COUNT(*) AS n_chunks,
       CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens
FROM feats GROUP BY 1, 2, 3
"""
)

# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

_BOTH_EXACT = (
    "corpus2 AS (SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 10000, text FROM documents)"
)
_BOTH_NEAR = (
    "corpus2 AS (SELECT doc_id AS id, text FROM documents UNION ALL "
    "SELECT doc_id + 10000, text || ' extra tail words here' FROM documents)"
)
_SHINGLES = """
sh AS (
  SELECT id, CASE WHEN len(w) >= 3
    THEN list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)])
    ELSE [array_to_string(w, ' ')] END AS sh
  FROM (SELECT id, string_split_regex(trim(text), '\\s+') AS w FROM corpus2)
)
"""

ORACLES["dedup_exact"] = f"""
WITH {_BOTH_EXACT}
SELECT md5(text) AS fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM corpus2 GROUP BY 1
"""

ORACLES["dedup_ngram_jaccard"] = f"""
WITH {_BOTH_NEAR}, {_SHINGLES},
pairs AS (SELECT doc_id AS id_a, doc_id + 10000 AS id_b FROM documents)
SELECT p.id_a, p.id_b,
  CAST(len(list_intersect(sa.sh, sb.sh)) AS INT) AS n_intersect,
  CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS INT) AS n_union
FROM pairs p JOIN sh sa ON sa.id = p.id_a JOIN sh sb ON sb.id = p.id_b
WHERE len(list_intersect(sa.sh, sb.sh)) * 100
      >= 60 * len(list_distinct(list_concat(sa.sh, sb.sh)))
"""

_SIGS = ", ".join(
    f"list_aggregate(list_transform(sh, s -> md5('{p}|' || s)), 'min') AS m{p}"
    for p in range(16)
)
_BANDS = " UNION ALL ".join(
    f"SELECT id, {b} AS band, md5(m{4 * b} || '|' || m{4 * b + 1} || '|' || "
    f"m{4 * b + 2} || '|' || m{4 * b + 3}) AS key FROM sig"
    for b in range(4)
)

ORACLES["dedup_minhash"] = f"""
WITH {_BOTH_NEAR}, {_SHINGLES},
sig AS (SELECT id, {_SIGS} FROM sh),
bands AS ({_BANDS}),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
         WHERE a.id < b.id)
SELECT c.id_a, c.id_b,
  CAST(len(list_intersect(sa.sh, sb.sh)) AS INT) AS n_intersect,
  CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS INT) AS n_union
FROM cand c JOIN sh sa ON sa.id = c.id_a JOIN sh sb ON sb.id = c.id_b
WHERE len(list_intersect(sa.sh, sb.sh)) * 100
      >= 60 * len(list_distinct(list_concat(sa.sh, sb.sh)))
"""

_BITSUMS = ", ".join(
    f"list_sum([((v // {1 << j}) % 2) * 2 - 1 for v in hv]) AS s{j}" for j in range(32)
)
_SIGSUM = " + ".join(f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(32))

ORACLES["dedup_simhash"] = f"""
WITH {_BOTH_NEAR},
hv AS (SELECT id, [('0x' || substr(md5(w), 1, 8))::BIGINT
                   for w in list_distinct(string_split_regex(trim(lower(text)), '\\s+'))] AS hv
       FROM corpus2),
bits AS (SELECT id, {_BITSUMS} FROM hv),
sigs AS (SELECT id, CAST({_SIGSUM} AS BIGINT) AS sig FROM bits),
pairs AS (SELECT doc_id AS id_a, doc_id + 10000 AS id_b FROM documents)
SELECT p.id_a, p.id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM pairs p JOIN sigs a ON a.id = p.id_a JOIN sigs b ON b.id = p.id_b
WHERE bit_count(xor(a.sig, b.sig)) <= 32
"""

_CORPUS3 = (
    "corpus3 AS (SELECT doc_id AS id, text FROM documents "
    "UNION ALL SELECT doc_id + 10000, text || ' extra tail words here' FROM documents "
    "UNION ALL SELECT doc_id + 20000, text || ' extra tail words here more' FROM documents)"
)
_SHINGLES3 = _SHINGLES.replace("FROM corpus2", "FROM corpus3")

# near-dup clusters: MinHash pairs over corpus3, symmetric closure,
# component = min reachable id via recursive UNION (fixpoint, cycle-safe)
ORACLES["dedup_components"] = f"""
WITH RECURSIVE {_CORPUS3}, {_SHINGLES3},
sig AS (SELECT id, {_SIGS} FROM sh),
bands AS ({_BANDS}),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
         WHERE a.id < b.id),
dup_pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN sh sa ON sa.id = c.id_a JOIN sh sb ON sb.id = c.id_b
  WHERE len(list_intersect(sa.sh, sb.sh)) * 100
        >= 60 * len(list_distinct(list_concat(sa.sh, sb.sh)))),
edges AS (SELECT id_a AS src, id_b AS dst FROM dup_pairs
          UNION SELECT id_b, id_a FROM dup_pairs),
reach(a, b) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
comp AS (SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a)
SELECT c3.id, COALESCE(comp.component, c3.id) AS component,
       c3.id = COALESCE(comp.component, c3.id) AS is_survivor
FROM corpus3 c3 LEFT JOIN comp ON comp.id = c3.id
"""

_DOT = (
    "list_reduce([{a}[i]::DOUBLE * {b}[i]::DOUBLE for i in range(1, len({a})+1)], "
    "(x, y) -> x + y)"
)


def _cos(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


ORACLES["dedup_embedding"] = f"""
WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
copies AS (SELECT vec_id + 10000 AS vec_id, vec_id AS orig,
                  CASE WHEN vec_id % 2 = 0 THEN v
                       ELSE [-x for x in v] END AS v
           FROM e)
SELECT e.vec_id AS id_a, c.vec_id AS id_b
FROM e JOIN copies c ON c.orig = e.vec_id
WHERE {_cos("e.v", "c.v")} >= 0.95
"""

ORACLES["ann_bruteforce"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_cos("qv", "cv")} AS cos
  FROM q, c WHERE query_id != neighbor_id),
r AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r WHERE rank <= 5
"""

ORACLES["ann_lsh"] = f"""
WITH a AS (SELECT vec_id AS aid, embedding AS av FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id, embedding AS vv FROM embeddings),
dots AS (SELECT v.vec_id, a.aid, {_DOT.format(a="v.vv", b="a.av")} AS dot FROM v, a),
buckets AS (SELECT vec_id, SUM(CASE WHEN dot > 0 THEN CAST(POW(2, aid) AS BIGINT) ELSE 0 END) AS bucket
            FROM dots GROUP BY 1),
q AS (SELECT b.vec_id AS query_id, v.vv AS qv, b.bucket
      FROM buckets b JOIN v ON v.vec_id = b.vec_id WHERE b.vec_id % 50 = 0),
c AS (SELECT b.vec_id AS neighbor_id, v.vv AS cv, b.bucket
      FROM buckets b JOIN v ON v.vec_id = b.vec_id),
scored AS (SELECT query_id, neighbor_id, {_cos("qv", "cv")} AS cos
           FROM q JOIN c ON q.bucket = c.bucket WHERE query_id != neighbor_id),
r AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r WHERE rank <= 5
"""

# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
    "zh": ("de5", "shi4", "zhong", "wen2", "ni3"),
}
_LANG_SCORES = " UNION ALL ".join(
    f"SELECT doc_id, '{lang}' AS lang, "
    f"CAST(len(list_filter(words, x -> list_contains({list(ms)}, x))) AS INT) AS score "
    f"FROM w"
    for lang, ms in sorted(_MARKERS.items())
)

ORACLES["lang_id"] = f"""
WITH w AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS words FROM documents),
s AS ({_LANG_SCORES}),
r AS (SELECT doc_id, lang, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
      FROM s)
SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred
FROM r WHERE rn = 1
"""

ORACLES["quality_score"] = """
WITH w AS (SELECT doc_id, text, string_split_regex(text, '\\s+') AS words FROM documents)
SELECT doc_id,
  CAST(length(text) AS INT) AS n_chars,
  CAST(len(words) AS INT) AS n_words,
  CAST(len(list_filter(words, x ->
    list_contains(['the','a','and','of','to','is','in'], lower(x)))) AS INT) AS n_stopwords,
  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INT) AS n_alpha,
  CAST(CASE WHEN len(words) >= 20 AND
       len(list_filter(words, x -> list_contains(['the','a','and','of','to','is','in'], lower(x)))) * 100
       >= len(words) * 5 THEN 2
       WHEN len(words) >= 5 THEN 1 ELSE 0 END AS INT) AS quality_bucket
FROM w
"""

ORACLES["token_count"] = """
SELECT doc_id,
  CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS ws_tokens,
  CAST(list_sum([(length(w) + 3) // 4
        for w in string_split_regex(trim(text), '\\s+')]) AS INT) AS bpe_tokens
FROM documents
"""

ORACLES["doc_fingerprint"] = (
    "SELECT doc_id, md5(text) AS fingerprint FROM documents"
)

ORACLES["multimodal_features"] = """
SELECT doc_id AS blob_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
  CAST(length(text) AS INT) AS n_bytes,
  CAST(CASE doc_id % 3 WHEN 0 THEN length(text) % 640 + 1
       WHEN 1 THEN 0 ELSE length(text) % 1920 + 1 END AS INT) AS width,
  CAST(CASE doc_id % 3 WHEN 0 THEN length(text) % 480 + 1
       WHEN 1 THEN 0 ELSE length(text) % 1080 + 1 END AS INT) AS height,
  CAST(CASE doc_id % 3 WHEN 0 THEN 1
       WHEN 1 THEN length(text) % 16000 + 1 ELSE length(text) % 300 + 1 END AS INT) AS n_frames
FROM documents
"""

ORACLES["event_stats"] = """
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""

ORACLES["duration_quantiles"] = """
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM events)
SELECT event_type, value AS median_value FROM r WHERE rn = (cnt + 1) // 2
"""
