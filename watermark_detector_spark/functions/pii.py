"""PII detection + scrubbing for web-text corpora: emails, SSNs, phone
numbers, IPv4 addresses — the standard redaction pass a training-data
pipeline runs before tokenization (cf. the C4/RefinedWeb release notes'
PII removal steps).

Pure built-in regexp expressions (JVM regex engine, codegen'd): at
10^12 documents this must ride the scan with zero shuffle and zero
Python, so patterns are limited to constructs shared by java.util.regex
and RE2 (no look-around, no back-references) — which is also what makes
the operator DuckDB-oracle-able (driver query q80).

Reference analog: the redaction role of the detector's masking output
(train_watermarks.py's mask channel) applied to text instead of pixels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement) — applied IN ORDER. SSN precedes phone
# so a 3-2-4 digit group is never half-eaten by the 3-3-4 phone rule;
# phone precedes IPv4 so dotted phone variants are classified as
# phones. Patterns are RE2-compatible (word boundaries + bounded
# repetition only).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_count(text: Column, kind: str) -> Column:
    """#matches of one PII kind (counted on the ORIGINAL text — counts
    are independent of scrub order for the non-overlapping patterns
    above because each earlier replacement token contains no digits or
    '@' for a later pattern to match)."""
    pat = dict((k, p) for k, p, _ in PII_PATTERNS)[kind]
    return F.size(
        F.regexp_extract_all(text, F.lit(pat), F.lit(0))
    ).cast("bigint")


def scrub_col(text: Column) -> Column:
    """The scrubbed text column: every PII match replaced by its typed
    token, patterns applied in PII_PATTERNS order."""
    out = text
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def scrub_pii(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-doc scrub + per-kind counts: (id, clean_text, n_email,
    n_ssn, n_phone, n_ipv4, has_pii). One projection — zero shuffle,
    whole-stage-codegen'd, safe to fuse with any downstream stage."""
    text = F.col(text_col)
    counts = [pii_count(text, k).alias(f"n_{k}") for k, _, _ in PII_PATTERNS]
    out = df.select(id_col, scrub_col(text).alias("clean_text"), *counts)
    total = None
    for k, _, _ in PII_PATTERNS:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)
