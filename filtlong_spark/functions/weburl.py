"""URL canonicalization — the first dedup key of any web-crawl pipeline
(Common-Crawl crawls the same page as http/https, with/without tracking
params, fragments, default ports and case-varied hosts).

Rules (deterministic, order matters, mirrored exactly in the DuckDB
oracle SQL in __spark_entry__.py):

1. strip the fragment (``#...``)
2. lowercase the scheme and authority (host[:port]); path/query keep case
3. drop default ports (``:80`` for http, ``:443`` for https)
4. percent-encoding normalization (RFC 3986 §6.2.2): decode %XX for the
   UNRESERVED set (ALPHA / DIGIT / ``-._~`` — e.g. ``%7E`` -> ``~``),
   either hex case, and uppercase the hex of every still-encoded octet
   (``%3a`` -> ``%3A``). One generated rule list (``percent_rules``),
   applied as a SEQUENTIAL literal replace chain in both engines: an
   Arrow-batched pandas kernel Spark-side, nested ``replace()`` CTE
   layers in the DuckDB oracle — identical rules, identical order
   (reserved octets like ``%2F``/``%25`` are never decoded, so
   double-encoded sequences cannot cascade)
5. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``) and
   empty params (``&&``, lone/trailing ``&``); the ``?`` goes too when
   nothing survives
6. strip one trailing ``/`` unless the path is just ``/``

Catalyst expressions throughout (regexp + one short array filter per
doc — doc grain, not token grain, so the interpreted HOF cost is
irrelevant), except rule 4's replace chain, which lives in a pandas
kernel: a ~210-literal Catalyst ``replace`` tree blows the JIT codegen
sweet spot (15-19 s first-compile, BENCH.md r4) while the same chain is
C-level ``str.replace`` passes over only the %-carrying rows. The whole
canonicalizer stays map-only either way.
"""

from __future__ import annotations

import string
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_RE = "^(utm_[^=]*|gclid|fbclid)(=.*)?$"

_AUTH_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"

_HEX = "0123456789abcdef"
_UNRESERVED = frozenset(string.ascii_letters + string.digits + "-._~")


@lru_cache(maxsize=1)
def percent_rules() -> tuple[tuple[str, str], ...]:
    """(pattern, replacement) literal pairs, in application order:
    decode both hex-case variants of every unreserved octet; uppercase
    the lowercase-hex form of every reserved one. Shared verbatim with
    the SQL oracle builder (mixed-case forms like %aB are left alone —
    canonical emitters produce all-lower or all-upper hex)."""
    rules = []
    for a in _HEX:
        for b in _HEX:
            pair = a + b
            up = pair.upper()
            ch = chr(int(pair, 16))
            if ch in _UNRESERVED:
                rules.append(("%" + up, ch))
                if up != pair:
                    rules.append(("%" + pair, ch))
            elif up != pair:
                rules.append(("%" + pair, "%" + up))
    return tuple(rules)


@lru_cache(maxsize=1)
def _percent_normalize_udf():
    """Arrow-batched kernel for rule 4. The ~210-literal rule list used
    to be a generated Catalyst ``replace`` chain — map-only and correct,
    but an expression tree that deep blows the JIT sweet spot (15-19 s
    first-run codegen, paid per plan compile; see BENCH.md r4). As a
    pandas kernel the same chain is ~210 C-level ``str.replace`` passes
    over only the %%-carrying minority of each batch (real crawls: ~1%%
    of URLs), with zero codegen cost and identical linear map-only
    scaling.

    Semantics note: this MUST emulate the sequential replace chain (rule
    1 applied everywhere, then rule 2, ...) — not a left-to-right %XX
    scanner — because the DuckDB oracle renders the identical chain and
    the two strategies diverge on adversarial inputs (``%%7%%37``: chain
    decodes the ``%%37``, then the newly-formed ``%%77``; a scanner
    stops after one pass). ``str.replace(regex=False)`` per rule is
    exactly the chain."""
    from pyspark.sql.functions import pandas_udf
    rules = percent_rules()  # captured by value in the closure

    @pandas_udf("string")
    def percent_normalize(s):
        mask = s.str.contains("%", regex=False).fillna(False)
        if not mask.any():
            return s
        sub = s[mask]
        for pat, rep in rules:
            sub = sub.str.replace(pat, rep, regex=False)
        out = s.copy()
        out[mask] = sub
        return out

    return percent_normalize


def _percent_normalize(u: Column) -> Column:
    # %-free strings (the overwhelming majority of a real crawl) are
    # passed through by a vectorized mask inside the kernel — the gate
    # lives worker-side because Catalyst pulls Python UDFs into their
    # own ArrowEvalPython projection, so a CASE around the call would
    # not prevent evaluation.
    return _percent_normalize_udf()(u)


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
    # 4. percent-encoding normalization (before the param filter, so
    # encoded param names compare post-normalization)
    u = _percent_normalize(u)
    # 5. tracking params: split query, filter, rejoin
    base = F.regexp_replace(u, r"\?.*$", "")
    query = F.when(u.contains("?"),
                   F.regexp_replace(u, r"^[^?]*\?", "")).otherwise(F.lit(""))
    kept = F.filter(F.split(query, "&"),
                    lambda p: ~p.rlike(TRACKING_RE) & (p != F.lit("")))
    u = F.when((query == "") | (F.size(kept) == 0), base) \
        .otherwise(F.concat(base, F.lit("?"), F.array_join(kept, "&")))
    # 6. trailing slash (not the root path)
    u = F.regexp_replace(u, "(://[^/?#]+/[^?#]*[^/?#])/((\\?[^#]*)?)$", "$1$2")
    return u
