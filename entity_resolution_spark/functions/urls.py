"""URL canonicalization for web-corpus (Common-Crawl-style) pipelines.

URL-level dedup is the cheapest stage of a web-text pipeline (CCNet §3.1
dedups by URL before content hashing): normalize each page's URL so that
trivially-different spellings of the same resource collapse, then a plain
hash aggregate on the canonical form groups re-crawls and mirrors.

Everything here is a JVM column expression (regexp extract/replace + array
ops) — no UDF, no shuffle; the canonicalization itself adds zero stages to
whatever plan consumes it.  The regexes avoid constructs that differ
between Java regex and RE2 so the DuckDB oracle can run the identical
logic.

Canonical form:
  * scheme and host lowercased; leading ``www.`` dropped
  * default ports stripped (``:80`` for http, ``:443`` for https)
  * path: duplicate slashes collapsed, trailing slashes dropped
  * query: params split on ``&``; tracking params (``utm_*``, ``fbclid``,
    ``gclid``, ``ref``) and empties dropped; the rest sorted (binary
    ordering in both engines) and rejoined
  * fragment dropped
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Java-regex- and RE2-compatible pieces.
_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY = r"\?([^#]*)"
TRACKING_PARAM = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def canonical_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT, 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""),
        # strip only the scheme's default port
        r":(80|443)$",
        "",
    )
    # un-strip a non-default port: http://h:443 and https://h:80 keep theirs
    host = F.when(
        ((scheme == "http") & hostport.endswith(":443"))
        | ((scheme == "https") & hostport.endswith(":80")),
        F.regexp_replace(hostport, r"^www\.", ""),
    ).otherwise(host)
    path = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(url, _PATH, 1), "/{2,}", "/"),
        "/+$",
        "",
    )
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract(url, _QUERY, 1), "&"),
                lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit("")),
    )


def host_of(url: Column) -> Column:
    """Registrable host of a URL (lowercased, www-stripped, port dropped) —
    the grouping key for per-domain corpus statistics.  Pure JVM regex."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT, 1))
    return F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":\d+$", ""
    )


def domain_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host with >= 2 labels (``a.b.co`` →
    ``['a.b.co', 'b.co']``): the equi-join key set for blocklist matching.
    A UT1-style blocklist entry blocks a host iff it equals one of these —
    turning "host ends with .blocked.domain" into an equi-join instead of
    a non-equi scan (the classic suffix-explode trick; list length is the
    label count, bounded ~5 for real hosts).

    Hosts with fewer than 2 labels (``localhost``, the empty host a
    malformed URL extracts to) yield an empty list rather than crashing:
    an unguarded ``sequence(0, n-2)`` is ``sequence(0, -1)`` = a
    DESCENDING ``[0, -1]`` whose ``-1`` index makes ``slice`` throw, and
    real crawl data routinely contains malformed URLs."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))


def blocklist_hits(
    pages,
    blocked,
    url_col: str = "url",
    id_col: str = "doc_id",
):
    """Rows of ``pages`` whose URL host falls under any blocked domain
    (exact host or any parent domain), with the matching blocklist entry.

    ``blocked`` is a 1-column DataFrame ``(domain)``; it is broadcast —
    blocklists are millions of rows at most, far under broadcast limits.
    Each page contributes ~label-count suffix rows; a host matching
    several entries reports the most specific (longest) one.
    Returns ``(id_col, host, matched_domain)``; anti-join the ids to keep
    the clean side."""
    host = host_of(F.col(url_col))
    sfx = pages.select(
        F.col(id_col), host.alias("host"),
        F.explode(domain_suffixes(host)).alias("sfx"),
    )
    hits = sfx.join(
        F.broadcast(blocked.selectExpr("domain AS sfx")), "sfx"
    )
    return (
        hits.groupBy(id_col, "host")
        .agg(F.max_by("sfx", F.length("sfx")).alias("matched_domain"))
    )
