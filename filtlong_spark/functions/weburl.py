"""URL canonicalization — the first dedup key of any web-crawl pipeline
(Common-Crawl crawls the same page as http/https, with/without tracking
params, fragments, default ports and case-varied hosts).

Rules (deterministic, order matters, mirrored exactly in the DuckDB
oracle SQL in __spark_entry__.py):

1. strip the fragment (``#...``)
2. lowercase the scheme and authority (host[:port]); path/query keep case
3. drop default ports (``:80`` for http, ``:443`` for https)
4. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``); the
   ``?`` goes too when nothing survives
5. strip one trailing ``/`` unless the path is just ``/``

All Catalyst expressions (regexp + one short array filter per doc — doc
grain, not token grain, so the interpreted HOF cost is irrelevant).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_RE = "^(utm_[^=]*|gclid|fbclid)(=.*)?$"

_AUTH_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def canonical_url_col(col: Column) -> Column:
    # 1. fragment
    u = F.regexp_replace(col, "#.*$", "")
    # 2. lowercase scheme://authority
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    u = F.concat(F.lower(auth), F.substring(u, F.length(auth) + 1, 1 << 30))
    # 3. default ports (authority is already lowercase). No lookahead —
    # the DuckDB mirror runs on RE2, which has none; capture the
    # following delimiter (or end) instead.
    u = F.regexp_replace(u, "^(http://[^/?#:]*):80($|[/?#])", "$1$2")
    u = F.regexp_replace(u, "^(https://[^/?#:]*):443($|[/?#])", "$1$2")
    # 4. tracking params: split query, filter, rejoin
    base = F.regexp_replace(u, r"\?.*$", "")
    query = F.when(u.contains("?"),
                   F.regexp_replace(u, r"^[^?]*\?", "")).otherwise(F.lit(""))
    kept = F.filter(F.split(query, "&"),
                    lambda p: ~p.rlike(TRACKING_RE) & (p != F.lit("")))
    u = F.when((query == "") | (F.size(kept) == 0), base) \
        .otherwise(F.concat(base, F.lit("?"), F.array_join(kept, "&")))
    # 5. trailing slash (not the root path)
    u = F.regexp_replace(u, "(://[^/?#]+/[^?#]*[^/?#])/((\\?[^#]*)?)$", "$1$2")
    return u
