"""URL canonicalization for web-corpus pipelines.

Web-scale dedup and recrawl pipelines key on a CANONICAL URL: the same
page arrives as ``HTTP://WWW.Example.com:80/a/?b=2&a=1&utm_source=x#top``
and ``http://example.com/a?a=1&b=2`` and must collapse to one key before
any host-level aggregation or URL-level dedup is meaningful. The
canonicalizer here is deliberately built from PORTABLE regex/array
primitives (no engine URL parser: Spark's ``parse_url`` follows Java URI
quirks no oracle engine reproduces), so the transform is bit-identical in
any engine with RE2/Java-compatible regex — which is what makes it
differential-testable.

Canonical form (each step pinned by tests and the DuckDB oracle twin):
scheme and host lowercased; userinfo dropped; default ports stripped
(:80 http, :443 https); leading ``www.`` dropped; fragment dropped;
tracking params removed (``utm_*``, ``gclid``, ``fbclid`` — only
unambiguous tracking keys; ``ref`` is content-bearing on many sites and
is kept, see TRACKING_PARAM_RE);
remaining query params sorted lexicographically as ``k=v`` strings;
empty path becomes ``/`` and trailing slashes collapse off non-root
paths. Strings that do not parse as absolute ``scheme://authority...``
URLs canonicalize to NULL (callers treat NULL as "not a URL").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Absolute-URL splitter (RFC 3986 appendix-B reduced to the absolute
#: case; no lookaround — Java and RE2 agree): 1=scheme, 2=authority,
#: 3=path, 4=query incl. '?', 5=fragment incl. '#'.
URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"

#: Tracking parameters dropped from query strings (matched on the key).
#: Deliberately restricted to UNAMBIGUOUS tracking keys: ``utm_*`` /
#: ``gclid`` / ``fbclid`` never carry content. Bare ``ref`` is NOT
#: stripped — on many sites (``?ref=branch`` on code hosts) it selects
#: genuinely distinct pages, and stripping it would false-merge them in
#: url_dedup_survivors, dropping real documents. Callers with a known
#: site profile pass their own pattern via ``tracking_param_re``.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid)(=.*)?$"


def _grp(col: Column, i: int) -> Column:
    return F.regexp_extract(col, URL_RE, i)


def canonicalize_url(col: Column,
                     tracking_param_re: str = TRACKING_PARAM_RE) -> Column:
    """Canonical URL per the module contract, or NULL for non-URLs.
    Pure per-row regex/array chain, JVM-evaluated, no shuffle.
    ``tracking_param_re`` overrides the dropped-parameter pattern (the
    default strips only the unambiguous ``utm_*``/``gclid``/``fbclid``
    keys — see TRACKING_PARAM_RE on why ``ref`` is content-bearing)."""
    scheme = F.lower(_grp(col, 1))
    # authority: drop userinfo (everything through the last '@'), then
    # lowercase; hosts are case-insensitive, userinfo is not corpus key
    # material either way
    auth = F.lower(F.regexp_replace(_grp(col, 2), r"^.*@", ""))
    host_port = F.when(
        (scheme == "http") & auth.rlike(":80$"),
        F.regexp_replace(auth, ":80$", "")
    ).when(
        (scheme == "https") & auth.rlike(":443$"),
        F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    host = F.regexp_replace(host_port, r"^www\.", "")
    raw_path = _grp(col, 3)
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.regexp_replace(raw_path, r"(.)/+$", "$1"))
    raw_q = F.regexp_replace(_grp(col, 4), r"^\?", "")
    params = F.filter(
        F.split(raw_q, "&"),
        lambda p: (p != "") & ~p.rlike(tracking_param_re))
    query = F.concat_ws("&", F.array_sort(params))
    rebuilt = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")))
    return F.when(col.rlike(URL_RE) & (host != ""), rebuilt)


#: href extractor over raw markup (same portable-regex stance as
#: text.strip_markup: a regex is not an HTML parser — single/unquoted
#: attribute syntax is out of contract, the standard corpus-scale trade).
HREF_RE = r"<a [^>]*href=\"([^\"]+)\""


def extract_links(col: Column) -> Column:
    """All double-quoted ``href`` targets of ``<a>`` tags in ``col``, in
    document order, as array<string> — the raw material for link graphs
    and outbound-host statistics; feed each element through
    :func:`canonicalize_url` before any grouping. Runs on the RAW markup
    (before text.strip_markup removes the tags). Empty array for
    link-free text, NULL for NULL."""
    return F.regexp_extract_all(col, F.lit(HREF_RE), 1)


def duck_canonicalize_url_sql(inner: str,
                              tracking_param_re: str = TRACKING_PARAM_RE
                              ) -> str:
    """DuckDB twin of :func:`canonicalize_url` — the identical step
    chain over the same regexes, so the engines cannot drift by edit.
    RE2 note: Spark's ``regexp_extract`` returns '' for a non-matching
    optional group, as does DuckDB's — the '?'-strip and ''-checks below
    rely on that shared convention."""
    url_re = URL_RE.replace("'", "''")
    track = tracking_param_re.replace("'", "''")

    def grp(i: int) -> str:
        return f"regexp_extract({inner}, '{url_re}', {i})"

    scheme = f"lower({grp(1)})"
    auth = f"lower(regexp_replace({grp(2)}, '^.*@', ''))"
    host_port = (
        f"CASE WHEN {scheme} = 'http' AND regexp_matches({auth}, ':80$') "
        f"THEN regexp_replace({auth}, ':80$', '') "
        f"WHEN {scheme} = 'https' AND regexp_matches({auth}, ':443$') "
        f"THEN regexp_replace({auth}, ':443$', '') ELSE {auth} END")
    host = f"regexp_replace({host_port}, '^www\\.', '')"
    raw_path = grp(3)
    path = (f"CASE WHEN {raw_path} = '' THEN '/' "
            f"ELSE regexp_replace({raw_path}, '(.)/+$', '\\1') END")
    raw_q = f"regexp_replace({grp(4)}, '^\\?', '')"
    params = (f"list_filter(string_split({raw_q}, '&'), "
              f"p -> p <> '' AND NOT regexp_matches(p, '{track}'))")
    query = f"array_to_string(list_sort({params}), '&')"
    rebuilt = (f"{scheme} || '://' || {host} || {path} || "
               f"CASE WHEN {query} <> '' THEN '?' || {query} ELSE '' END")
    return (f"CASE WHEN regexp_matches({inner}, '{url_re}') "
            f"AND {host} <> '' THEN {rebuilt} END")
