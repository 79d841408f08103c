"""URL canonicalization — the normalization step in front of URL-level
crawl dedup (every web-corpus pipeline dedups on canonical URL before any
content-level pass; reference scope: the reference archives raw streams
and leaves curation to downstream, so this family is additive engine
surface for the training-data pipeline).

``canonicalize_url`` is a pure JVM Column expression (regexp + array
built-ins, whole-stage-codegen friendly — no Python, no UDF), so at
100 TB it runs at scan speed and the subsequent dedup is one hash
shuffle on the canonical key.

Normalization steps (the conservative, lossless-for-ranking subset used
by CommonCrawl-style pipelines):

1. drop the scheme (``http(s)://``, case-insensitive)
2. drop the ``#fragment``
3. split ``host[:port]/path`` from the ``?query``
4. host: lowercase, strip one leading ``www.``, strip default ports
   ``:80``/``:443``
5. path: strip trailing ``/``
6. query: drop tracking params (``utm_*``, ``ref``, ``fbclid``,
   ``gclid``), sort the rest bytewise, rejoin with ``&``

Each step is mirrored 1:1 in the DuckDB oracle of ``q_url_dedup``
(queries/llm_web.py) so the whole chain is hash-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# params that never identify content; dropped before the query-param sort
TRACKING_RE = "^(utm_[a-z]+|ref|fbclid|gclid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` as a single Column expression."""
    # 1-2: scheme and fragment off
    bare = F.regexp_replace(
        F.regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://", ""), "#.*$", ""
    )
    # 3: host[:port]/path vs query
    hostpath = F.regexp_replace(bare, "\\?.*$", "")
    qmark = F.instr(bare, "?")
    query = F.when(qmark > 0, F.substr(bare, qmark + 1)).otherwise(F.lit(""))
    # 4: host rules
    host = F.regexp_replace(
        F.regexp_replace(F.lower(F.regexp_replace(hostpath, "/.*$", "")), "^www\\.", ""),
        ":(80|443)$",
        "",
    )
    slash = F.instr(hostpath, "/")
    # 5: path rules — substring from the first '/' onward (absent → empty)
    path = F.when(slash > 0, F.substr(hostpath, slash)).otherwise(F.lit(""))
    path = F.regexp_replace(path, "/$", "")
    # 6: query rules
    kept = F.array_sort(
        F.filter(
            F.split(query, "&", -1),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    canon_query = F.array_join(kept, "&")
    return F.concat(
        host,
        path,
        F.when(canon_query != "", F.concat(F.lit("?"), canon_query)).otherwise(
            F.lit("")
        ),
    )
