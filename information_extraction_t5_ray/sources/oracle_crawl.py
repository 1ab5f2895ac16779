"""DuckDB oracles for the crawl-intake operators (stages/crawl.py).

The crawl table is closed-form in ``doc_id`` (sources/crawl.py), so
every operator's expected output is one SQL query over the driver's
``documents`` view.  The CTE below is BUILT from the same constants
the generator uses (SNAPSHOT_MOD / CONTENT_CHANGE_MOD / host suffix),
so generator and oracle cannot drift apart.
"""

from __future__ import annotations

from .crawl import CONTENT_CHANGE_MOD, CRAWL_HOST_SUFFIX, SNAPSHOT_MOD

BLOCKED_SOURCES = ("src3", "src7", "src13")
HOST_QUOTA_K = 10


def _crawl_cte() -> str:
    m = SNAPSHOT_MOD
    cm = CONTENT_CHANGE_MOD
    return f"""WITH c AS (
  SELECT d.doc_id, d.source, d.lang,
         'https://'||d.source||'{CRAWL_HOST_SUFFIX}/p/'||lpad(CAST(d.doc_id AS VARCHAR),8,'0') AS url,
         d.source||'{CRAWL_HOST_SUFFIX}' AS host,
         TIMESTAMP '2020-01-01' + d.doc_id * INTERVAL 1 MINUTE + g.r * INTERVAL 1 DAY AS warc_ts,
         CAST(d.doc_id*16 + CASE WHEN d.doc_id%{cm}=0 THEN g.r ELSE 0 END AS BIGINT) AS content_id,
         CAST(d.n_chars + 7*g.r AS BIGINT) AS n_bytes
  FROM documents d CROSS JOIN generate_series(0, {m - 1}) AS g(r)
  WHERE g.r <= d.doc_id % {m}
)"""


def _latest_cte() -> str:
    return f"""{_crawl_cte()},
latest AS (
  SELECT url, host, warc_ts, content_id, n_bytes FROM (
    SELECT *, row_number() OVER (
        PARTITION BY url
        ORDER BY warc_ts DESC, content_id DESC, n_bytes DESC) AS rn
    FROM c
  ) WHERE rn = 1
)"""


def crawl_latest_sql() -> str:
    return f"{_latest_cte()} SELECT url, warc_ts, content_id, n_bytes FROM latest"


def domain_stats_sql() -> str:
    return f"""{_crawl_cte()}
SELECT host,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(count(*) AS BIGINT) AS n_pages,
       max(warc_ts) AS last_crawl
FROM c GROUP BY host"""


def blocklist_filter_sql() -> str:
    blocked = ",".join(f"'{s}'" for s in BLOCKED_SOURCES)
    return f"""{_crawl_cte()}
SELECT url, warc_ts, content_id, lang FROM c WHERE source NOT IN ({blocked})"""


def recrawl_changes_sql() -> str:
    return f"""{_crawl_cte()}
SELECT url,
       CAST(count(*) AS BIGINT) AS n_snapshots,
       CAST(SUM(CASE WHEN content_id <> prev THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
FROM (
  SELECT url, content_id,
         lag(content_id) OVER (PARTITION BY url ORDER BY warc_ts) AS prev
  FROM c
) GROUP BY url"""


def snapshot_intervals_sql() -> str:
    """Gaps-and-islands: run_id = running count of content changes."""
    return f"""{_crawl_cte()}
SELECT url, content_id,
       min(warc_ts) AS valid_from,
       max(warc_ts) AS valid_to,
       CAST(count(*) AS BIGINT) AS n_snaps
FROM (
  SELECT url, content_id, warc_ts,
         SUM(CASE WHEN prev IS NULL OR prev <> content_id THEN 1 ELSE 0 END)
           OVER (PARTITION BY url ORDER BY warc_ts
                 ROWS UNBOUNDED PRECEDING) AS run_id
  FROM (
    SELECT url, content_id, warc_ts,
           lag(content_id) OVER (PARTITION BY url ORDER BY warc_ts) AS prev
    FROM c
  )
) GROUP BY url, content_id, run_id"""


def url_frontier_sql(k: int = HOST_QUOTA_K) -> str:
    return f"""{_crawl_cte()},
rollup_ AS (
  SELECT url, host,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> content_id
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         max(warc_ts) AS last_crawl
  FROM (
    SELECT url, host, content_id, warc_ts,
           lag(content_id) OVER (PARTITION BY url ORDER BY warc_ts) AS prev
    FROM c
  ) GROUP BY url, host
)
SELECT host, url, n_changes, last_crawl FROM (
  SELECT *, row_number() OVER (
      PARTITION BY host ORDER BY n_changes DESC, last_crawl, url) AS rn
  FROM rollup_
) WHERE rn <= {k}"""


def host_quota_sql(k: int = HOST_QUOTA_K) -> str:
    return f"""{_latest_cte()}
SELECT host, url, warc_ts FROM (
  SELECT host, url, warc_ts,
         row_number() OVER (PARTITION BY host ORDER BY warc_ts, url) AS rn
  FROM latest
) WHERE rn <= {k}"""


def crawl_canonical_sql() -> str:
    """URL canonicalization + newest-per-canonical-url — ground truth
    for stages/crawl.canonical_latest over sources/crawl.messy_urls:
    the dirty decoration is closed-form in (d, r) and the canonical
    chain runs the SAME four RE2 patterns in the same order."""
    return f"""{_crawl_cte()},
mess AS (
  SELECT *, content_id // 16 AS d,
    (date_diff('second', TIMESTAMP '2020-01-01', warc_ts)
       - (content_id // 16) * 60) // 86400 AS r
  FROM c
),
dirty AS (
  SELECT warc_ts, content_id, n_bytes,
    CASE CAST((d + r) % 4 AS INTEGER)
      WHEN 0 THEN url || '?utm_source=feed&utm_campaign=c'
                      || CAST(d % 7 AS VARCHAR)
      WHEN 1 THEN url || '#sec' || CAST(d % 5 AS VARCHAR)
      WHEN 2 THEN upper(regexp_extract(url, '^[A-Za-z]+://[^/]*'))
                  || regexp_replace(url, '^[A-Za-z]+://[^/]*', '')
      ELSE url || '?'
    END AS url
  FROM mess
),
canon AS (
  SELECT warc_ts, content_id, n_bytes, url,
    lower(regexp_extract(u3, '^[A-Za-z]+://[^/]*'))
      || regexp_replace(u3, '^[A-Za-z]+://[^/]*', '') AS canon_url
  FROM (
    SELECT *, regexp_replace(regexp_replace(regexp_replace(
        url, '#.*$', ''), '[?&]utm_[^&#]*', '', 'g'), '[?&]+$', '') AS u3
    FROM dirty
  )
)
SELECT canon_url, url, warc_ts, content_id FROM (
  SELECT *, row_number() OVER (
    PARTITION BY canon_url
    ORDER BY warc_ts DESC, content_id DESC, n_bytes DESC, url DESC) AS rn
  FROM canon
) WHERE rn = 1"""
