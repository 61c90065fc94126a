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
