"""Registrable-domain extraction from a URL — pure Spark column expressions.

The north rule's group key is the registrable domain (BASELINE.json).
Implemented entirely with built-in functions (JVM-side, codegen'd — no UDF):
``parse_url(url, 'HOST')`` then a suffix heuristic: keep the last two
labels, or the last three when the second-level label is a well-known
multi-part public suffix (co/com/org/net/ac/gov/edu + 2-letter TLD).

At 100 TB this column is computed once per page and reused as the
partition/aggregation key; keeping it codegen'd (vs a Python UDF) keeps
the hot path inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MULTIPART_SLDS = ["co", "com", "org", "net", "ac", "gov", "edu"]


def host_of(url: Column) -> Column:
    return F.lower(F.parse_url(url, F.lit("HOST")))


def registrable_domain(url: Column) -> Column:
    """Registrable domain of the url's host (e.g. www.news.example.co.uk
    -> example.co.uk, www.example.com -> example.com)."""
    host = host_of(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    sld = F.element_at(labels, -2)  # second-level label
    tld = F.element_at(labels, -1)
    is_multipart = sld.isin(_MULTIPART_SLDS) & (F.length(tld) == 2) & (n >= 3)
    take = F.when(is_multipart, F.lit(3)).otherwise(F.lit(2))
    take = F.least(take, n)
    return F.array_join(F.slice(labels, n - take + 1, take), ".")


# -- URL quality filtering (RefinedWeb/C4-style corpus hygiene) ------------
# All regex-only column expressions (no parse_url) so the SAME feature
# definitions replay in any regex-capable SQL engine — which is what
# makes the operator DuckDB-oracle-able (driver query q83) — and stay
# inside WholeStageCodegen on the scan.

URL_BLOCKED_HOST_PREFIXES = ("ads.", "track.", "cdn.")
URL_BANNED_TOKENS = ("casino", "viagra", "xxx")


def url_host(url: Column) -> Column:
    """Host via regex (scheme://HOST[/?#...]); '' when unparseable."""
    return F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1))


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+(/[^?#]*)", 1)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def url_path_depth(url: Column) -> Column:
    """#path segments: '/a/b/c' -> 3, '/' and '' -> 0."""
    p = F.regexp_replace(url_path(url), "/+$", "")
    return (F.length(p)
            - F.length(F.replace(p, F.lit("/"), F.lit("")))).cast("bigint")


def url_n_params(url: Column) -> Column:
    q = url_query(url)
    return F.when(q == "", F.lit(0)).otherwise(
        F.length(q) - F.length(F.replace(q, F.lit("&"), F.lit(""))) + 1
    ).cast("bigint")


def url_keep(url: Column,
             blocked_prefixes: tuple[str, ...] = URL_BLOCKED_HOST_PREFIXES,
             banned_tokens: tuple[str, ...] = URL_BANNED_TOKENS,
             max_depth: int = 6, max_params: int = 4,
             max_len: int = 512) -> Column:
    """Composite URL hygiene gate (RefinedWeb §3.1's URL filtering
    re-expressed): drop ad/tracker/CDN hosts, spam tokens anywhere in
    the url, over-deep paths, query-parameter farms, absurd lengths.
    One boolean codegen column — rides the scan, no shuffle."""
    host = url_host(url)
    cond = (host != "") & (F.length(url) <= max_len) \
        & (url_path_depth(url) <= max_depth) \
        & (url_n_params(url) <= max_params)
    for p in blocked_prefixes:
        cond = cond & ~host.startswith(p)
    low = F.lower(url)
    for t in banned_tokens:
        cond = cond & ~low.contains(t)
    return cond


URL_TRACKING_PARAM_RE = (
    "^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_eid|ref|ref_src)="
)


def url_canonicalize(url: Column,
                     strip_www: bool = True,
                     tracking_re: str = URL_TRACKING_PARAM_RE) -> Column:
    """Canonical URL form — THE dedup key for URL-level dedup (every
    Common-Crawl pipeline's first dedup pass; CC itself deduplicates
    per crawl by canonicalized URL): lowercase scheme+host, default
    port stripped (:80 for http, :443 for https), leading ``www.``
    stripped, fragment dropped, trailing path slashes collapsed (empty
    path -> ``/``), tracking query params (utm_*, fbclid, gclid, ...)
    removed and the survivors SORTED so param order cannot split a
    group. Path case, param VALUES and param repetition are preserved
    — they are semantically significant.

    Pure regex + array codegen (no parse_url, which DuckDB lacks) —
    every step replays verbatim in an independent engine, and the
    column rides the scan: canonical-URL dedup is then one exact
    groupBy, same shape as q07. Input must carry a scheme
    (``x://...``); anything else passes through mangled-in ==
    mangled-out."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_replace(F.regexp_extract(pathq, "^([^?]*)", 1),
                            "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(tracking_re)))
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(F.size(params) > 0,
               F.concat(F.lit("?"), F.array_join(params, "&")))
        .otherwise(F.lit("")),
    )
