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
